#!/usr/bin/env python
"""Pre-bench host-era probe: is NOW a clean window to bless a bench?

    python tools/era_probe.py [baseline BENCH record, default newest repro]

This host's hypervisor steal arrives in ERAS — multi-minute windows that
inflate Spark wall times 1.2-3.7x uniformly (SURVEY §8; the r15 close
measured the same byte-identical row at 0.23s, 0.43s, and 0.85s in three
different windows). /proc/stat steal over a few seconds often reads ~0
INSIDE a burst era (theft is sub-second bursty), so the only reliable
era signal is the thing we actually care about: wall time of known-cost
work. This probe times two byte-identical-since-r7 Catalyst rows at
sf0.1 against a blessed baseline record and prints CLEAN / DRIFTED /
BURST:

  - CLEAN  (<= 1.15x median): bless-quality window — run
    `SPARK_GRAFT_BENCH_SAMPLES=5 python bench.py` now.
  - DRIFT  (<= 1.5x): usable for relative work; a blessed record taken
    here will trip the clean-chain anchor rule (bench_guard walks back).
  - BURST  (> 1.5x): measurements are garbage; wait and re-probe.

Exit code 0 only for CLEAN, 2 for DRIFT, 3 for BURST — scriptable:
    until python tools/era_probe.py; do sleep 300; done && python bench.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Byte-identical since r7 (SMT) / r1 (q1): any ratio these show vs a
# blessed record is host, not code.
PROBE_ROWS = ("smt_hoist_struct", "q1_pricing_summary")
SF_DIR = "/root/testdata/sf0.1"
CLEAN_MAX = 1.15
DRIFT_MAX = 1.5


def newest_repro() -> str:
    paths = sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*_repro.json")),
        key=lambda p: int(re.search(r"_r(\d+)_", p).group(1)),
    )
    if not paths:
        raise SystemExit("era_probe: no BENCH_r*_repro.json baseline found")
    return paths[-1]


def classify(med: float) -> tuple[str, int]:
    if med <= CLEAN_MAX:
        return "CLEAN", 0
    if med <= DRIFT_MAX:
        return "DRIFT", 2
    return "BURST", 3


def main(argv: list[str]) -> int:
    base_path = argv[1] if len(argv) > 1 else newest_repro()
    with open(base_path) as f:
        base = json.load(f)["queries"]

    import __spark_entry__ as entry_mod
    from kafka_custom_transforms_spark.session import get_spark

    spark = get_spark()
    qs = entry_mod.queries()
    ratios = []
    for name in PROBE_ROWS:
        if name not in base:
            continue
        qs[name](spark, SF_DIR).count()  # warm (one-time codegen)
        ts = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        ratios.append(med / base[name])
        print(
            f"  {name:24s} {med:5.2f}s vs {os.path.basename(base_path)} "
            f"{base[name]:5.2f}s = {med / base[name]:4.2f}x",
            file=sys.stderr,
        )
    if not ratios:
        raise SystemExit("era_probe: baseline shares no probe rows")
    med = statistics.median(ratios)
    label, code = classify(med)
    print(json.dumps({
        "metric": "era_probe", "label": label,
        "median_ratio": round(med, 3),
        "baseline": os.path.basename(base_path),
        "loadavg": open("/proc/loadavg").read().split()[0],
    }))
    return code


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
