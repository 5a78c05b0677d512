#!/usr/bin/env python
"""Standalone replica of the driver's correctness gate, runnable at any
scale factor:

    python tools/parity_sweep.py [sf_dir] [name_prefix ...]

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, comparing column names, row counts, and
exact values (order-insensitive, float repr — identical semantics to
``tests/test_oracle_parity.py``, which is the sf0.001 pytest flavor of
this sweep). Rows without an oracle get the driver's weak rows-only
check. Prints one status line per row to stderr, a JSON summary to
stdout, and exits nonzero if anything mismatches.

Default sf_dir is /root/testdata/sf0.01 — the scale the driver gates at.
Optional name prefixes restrict the sweep (e.g. ``dedup_`` ``smt_``).

History: rounds 8-11 each rebuilt this as a throwaway /tmp script to
verify the full registry at sf0.01 before round close; /tmp does not
survive the container, so it is now a committed tool (SURVEY §10).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import duckdb  # noqa: E402

from parity_common import TABLES, normalize as _normalize  # noqa: E402


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(argv[2:])

    import __spark_entry__ as entry_mod
    from kafka_custom_transforms_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sorted(n for n in queries if n.startswith(prefixes) or not prefixes)

    results: dict[str, dict] = {}
    n_fail = 0
    t_start = time.time()
    for name in names:
        t0 = time.time()
        status, err = "ok", None
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                if sorted(sdf.columns) != sorted(odf.columns):
                    status, err = "fail", (
                        f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
                    )
                elif len(sdf) != len(odf):
                    status, err = "fail", f"rows {len(sdf)} vs {len(odf)}"
                elif not _normalize(sdf).equals(_normalize(odf)):
                    status, err = "fail", "value mismatch"
            else:
                status = "rows_only"
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            status, err = "error", f"{type(e).__name__}: {e}"
        dt = time.time() - t0
        if status in ("fail", "error"):
            n_fail += 1
        results[name] = {"status": status, "sec": round(dt, 3), "err": err}
        print(f"{status:9s} {dt:6.2f}s {name}" + (f"  {err}" if err else ""),
              file=sys.stderr)

    summary = {
        "sf_dir": sf_dir,
        "total": len(names),
        "ok": sum(1 for r in results.values() if r["status"] == "ok"),
        "rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
        "failed": n_fail,
        "wall_sec": round(time.time() - t_start, 1),
        "failures": {n: r for n, r in results.items() if r["err"]},
    }
    print(json.dumps(summary))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
