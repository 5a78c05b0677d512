#!/usr/bin/env python
"""Shuffle-byte audit: per-query shuffle/input volume, straight from Spark.

    PYTHONPATH=/root/repo python tools/shuffle_audit.py [--sfs sf0.01,sf0.1]
        [--out SHUFFLE.md]

Wall-time evidence (bench.py, SCALING.md, STRESS.md) is hostage to
hypervisor vCPU steal (SURVEY §8); BYTE counters are not — a stage reads
and shuffles the same bytes no matter how contended the host is.  This
audit runs every engine bench row once per scale factor and reports, per
query:

  - input rows      (records read from sources, all stages — row counters
                     are exact; the vectorized parquet reader's BYTE counter
                     is not, so amplification is row-based)
  - shuffle MB      (shuffle write bytes, all stages)
  - shuffle rows / input rows (the survival factor: how much of the input
                     reaches an exchange instead of dying map-side — the
                     number that decides whether a plan survives 100 TB)
  - growth ratio    (shuffle bytes at sf0.1 / sf0.01 — the 10x data step;
                     ~10x is linear, >>10x flags a super-linear shuffle)

Byte totals come from the Spark UI REST API (/api/v1 stage metrics),
sampled before/after each query, so they include EVERYTHING the query
executes — including the eagerly-materialized localCheckpoint preludes of
the banded dedup family, which a walk over the final frame's executed
plan would miss.  Queries are freshly constructed per run (bench.py
convention) and materialized with .count().

Output: a markdown report (default SHUFFLE.md) + one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4099  # requested start port; Spark may bind +1.. if taken
UI_BASE = f"http://127.0.0.1:{UI_PORT}"  # rebound from sc.uiWebUrl in main()


def _rest(path: str):
    with urllib.request.urlopen(f"{UI_BASE}{path}", timeout=10) as r:
        return json.loads(r.read())


def _read_totals(app_id: str) -> dict:
    out = {"input_rows": 0, "shuffle_write": 0, "shuffle_records": 0, "spill": 0}
    for st in _rest(f"/api/v1/applications/{app_id}/stages?status=complete"):
        out["input_rows"] += st.get("inputRecords", 0)
        out["shuffle_write"] += st.get("shuffleWriteBytes", 0)
        out["shuffle_records"] += st.get("shuffleWriteRecords", 0)
        out["spill"] += st.get("memoryBytesSpilled", 0) + st.get("diskBytesSpilled", 0)
    return out


def _totals(app_id: str) -> dict:
    """Cumulative input/shuffle bytes over all completed stages.

    The status store is fed asynchronously by the listener bus, so metrics
    of a just-finished job can post AFTER the driver-side action returns —
    without settling, those bytes leak into the next query's delta.  Poll
    until no stage is active and two consecutive reads agree."""
    deadline = time.time() + 15
    prev = _read_totals(app_id)
    while time.time() < deadline:
        time.sleep(0.2)
        if _rest(f"/api/v1/applications/{app_id}/stages?status=active"):
            prev = None
            continue
        cur = _read_totals(app_id)
        if cur == prev:
            return cur
        prev = cur
    return prev or _read_totals(app_id)


def _audit(spark, app_id, queries, names, dirs):
    """Per-query stage-metric deltas for each (label, sf_dir) in dirs."""
    rows: dict[str, dict[str, dict]] = {}
    for label, sf_dir in dirs:
        for name in names:
            before = _totals(app_id)
            queries[name](spark, sf_dir).count()
            after = _totals(app_id)
            rows.setdefault(name, {})[label] = {k: after[k] - before[k] for k in before}
            print(f"  {label} {name}: "
                  f"in {rows[name][label]['input_rows']} rows "
                  f"shuf {rows[name][label]['shuffle_write']/1e6:.2f}MB",
                  file=sys.stderr)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="sf0.01,sf0.1")
    ap.add_argument("--out", default="SHUFFLE.md")
    ap.add_argument("--queries", default="", help="comma list; default = bench engine rows")
    ap.add_argument(
        "--x10",
        action="store_true",
        help="append a beyond-bench section: the scale_stress x10 replica "
        "vs sf0.1 for the stress query set (generates /tmp/stress_x10 if "
        "missing)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from bench import BENCH_QUERIES, ENGINE_QUERIES

    names = args.queries.split(",") if args.queries else list(ENGINE_QUERIES)
    assert set(names) <= set(BENCH_QUERIES) | set(entry_mod.queries())

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("shuffle-audit")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedStages", "100000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # If UI_PORT was taken, Spark bound the next free port — querying the
    # configured port would silently read a DIFFERENT app's metrics. The
    # context's own uiWebUrl is authoritative for the PORT; keep loopback
    # for the host (uiWebUrl advertises the hostname, and this box only
    # resolves loopback reliably).
    global UI_BASE
    UI_BASE = "http://127.0.0.1:" + spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app_id = _rest("/api/v1/applications")[0]["id"]
    queries = entry_mod.queries()

    wall0 = time.time()
    sfs = args.sfs.split(",")
    rows = _audit(spark, app_id, queries, names,
                  [(sf, f"/root/testdata/{sf}") for sf in sfs])

    mb = lambda b: b / 1e6  # noqa: E731
    lines = [
        "# SHUFFLE — per-query shuffle/input bytes (auto-generated by tools/shuffle_audit.py)",
        "",
        "Byte counters are steal-immune (a stage moves the same bytes however "
        "contended the host is), measured as before/after deltas of the REST "
        "stage metrics, so eagerly-checkpointed preludes are included. "
        "`shuffle rows/input rows` is the survival factor; `growth` is shuffle "
        "bytes across the 10x data step sf0.01 -> sf0.1 (~10x = linear; "
        "rows shuffling tiny aggregates or broadcast-only plans sit far "
        "below; >>10x would flag a super-linear shuffle).",
        "",
        f"| query | input Mrows @{sfs[-1]} | shuffle MB @{sfs[-1]} | shuffle rows/input rows | growth {sfs[0]}->{sfs[-1]} |",
        "|---|---|---|---|---|",
    ]
    no_shuffle = []
    for name in names:
        big, small = rows[name][sfs[-1]], rows[name][sfs[0]]
        amp = (
            f"{big['shuffle_records'] / big['input_rows']:.3f}"
            if big["input_rows"]
            else "—"
        )
        if big["shuffle_write"] == 0 and small["shuffle_write"] == 0:
            no_shuffle.append(name)
        growth = (
            f"{big['shuffle_write'] / small['shuffle_write']:.1f}x"
            if small["shuffle_write"]
            else ("0 both" if big["shuffle_write"] == 0 else "0 at small sf")
        )
        lines.append(
            f"| {name} | {big['input_rows']/1e6:.2f} | {mb(big['shuffle_write']):.2f} "
            f"| {amp} | {growth} |"
        )

    growths = {
        n: rows[n][sfs[-1]]["shuffle_write"] / rows[n][sfs[0]]["shuffle_write"]
        for n in names
        if rows[n][sfs[0]]["shuffle_write"]
    }
    if growths:
        worst = max(growths, key=growths.get)
        wg = growths[worst]
        above = {n: g for n, g in sorted(growths.items(), key=lambda kv: -kv[1]) if g > 11.0}
        growth_line = (
            "- Rows above ~11x growth over the 10x step (10-11x is linear "
            "within shuffle-compression and AQE partition-count variance): "
            + (
                ", ".join(f"`{n}` {g:.1f}x" for n, g in above.items())
                or f"none (worst: `{worst}` at {wg:.1f}x)"
            )
            + "."
        )
    else:
        worst, wg = None, None
        growth_line = (
            "- No audited row shuffled any bytes at the small scale factor — "
            "growth ratios are undefined for this query subset."
        )
    lines += [
        "",
        "## Reading",
        "",
        growth_line,
        "- Queries with shuffle-rows/input-rows well under 1 are "
        "map-side-combined or broadcast-joined: the scan dominates and the "
        "exchange carries only aggregates/survivors — exactly the 100 TB "
        "posture.",
        "- Survival factors above 1 are the banded families' designed band "
        "expansion (each item emits one row per band ahead of the bucket "
        "join); growth slightly above 10x there is in-bucket candidate "
        "growth — collision pairs scale with bucket occupancy, bounded by "
        "the band/row trade-off, not a hidden quadratic.",
        "- `similarity_topk_lsh`'s growth law (r14, decomposed): the row "
        "pins `tables=12, bits_per_table=4` so its full-pipeline oracle "
        "stays byte-identical, and FIXED 4-bit buckets (16/table) make "
        "chance candidates per query ~`tables * n / 2^bits` = 0.75n — "
        "with the workload's q ∝ n, candidate/shuffle rows are "
        "~quadratic in the corpus BY PIN, which is exactly the "
        "above-band reading. The operator's DEFAULT is no longer this "
        "shape: `bits_per_table=None` derives occupancy-constant bits "
        "from plan statistics (dedup._occupancy_bits — the same "
        "anti-quadratic planner minhash/simhash use), making default "
        "candidates ~`tables * occupancy * q` — linear. The pinned "
        "registry row stays the small-SF oracle anchor, like "
        "similarity_topk stays the pinned-exact yardstick.",
    ]
    spill_total = sum(
        rows[n][sf]["spill"] for n in names for sf in sfs
    )
    lines.append(
        f"- Spill across every query at every scale: "
        f"{spill_total/1e6:.1f} MB"
        + (
            " — zero; no operator exceeds executor memory at these sizes, "
            "and partition sizing (SCALE.md) keeps it that way at 100 TB."
            if spill_total == 0
            else " (memory+disk, see per-query logs)."
        )
    )
    if no_shuffle:
        lines.append(
            f"- {len(no_shuffle)} rows shuffle ZERO bytes at either scale "
            "(broadcast-only or single-stage plans): "
            + ", ".join(f"`{n}`" for n in no_shuffle)
            + "."
        )
    x10_summary = None
    if args.x10:
        from pathlib import Path

        from scale_stress import STRESS_QUERIES, _gen_dataset

        outdir = Path("/tmp/stress_x10")
        if not (outdir / "embeddings.parquet").exists():
            gen = _gen_dataset(10, outdir)
            print(f"  x10 replica generated in {gen:.1f}s", file=sys.stderr)
        # stress-only rows (similarity_topk_auto, ..._lsh_default) are
        # injected by scale_stress's main(), not registry entries — audit
        # only the registered subset here
        stress_names = [n for n in STRESS_QUERIES if n in queries]
        srows = _audit(spark, app_id, queries, stress_names,
                       [("x1", "/root/testdata/sf0.1"), ("x10", str(outdir))])
        lines += [
            "",
            "## Beyond bench: the scale_stress x10 replica (50k docs / 6M lineitem)",
            "",
            "Same audit over STRESS.md's decorrelated x10 tables — the byte "
            "view of that wall-time curve. `similarity_topk` is the "
            "brute-force yardstick whose COMPUTE grows ~K^2 (44.5x wall in "
            "STRESS.md); its SHUFFLE stays linear because the quadratic work "
            "is map-side scoring against a broadcast query set — quadratic "
            "compute with linear data movement is exactly what a "
            "scale-out-able exact baseline should look like.",
            "",
            "Growth above 10x here is map-side-combine SATURATION, not "
            "super-linear movement. q18 groups lineitem by l_orderkey (~4 "
            "rows per group): at x1 the partial aggregate emits ~1 record "
            "per group (147k, perfect combine); at x10 the per-task "
            "distinct-key count overflows the partial hash map, which "
            "degrades to pass-through by contract (5.3M records ≈ the 6M-row "
            "input — verified on the exchange's own SQLMetrics). The "
            "exchange is bounded by INPUT rows, so growth is linear past "
            "the saturation point; when a 1x-input shuffle matters at "
            "cluster scale, the fix is bucketing the fact table on the "
            "group key (SCALE.md). Ratios on sub-0.1MB bases "
            "(q1_pricing_summary: 6 groups x per-task partial rows) are "
            "floor noise.",
            "",
            "| query | input Mrows @x10 | shuffle MB @x10 | growth x1->x10 |",
            "|---|---|---|---|",
        ]
        for name in stress_names:
            big, small = srows[name]["x10"], srows[name]["x1"]
            growth = (
                f"{big['shuffle_write'] / small['shuffle_write']:.1f}x"
                if small["shuffle_write"]
                else "0 at x1"
            )
            lines.append(
                f"| {name} | {big['input_rows']/1e6:.2f} "
                f"| {mb(big['shuffle_write']):.2f} | {growth} |"
            )
        x10_summary = {
            n: round(srows[n]["x10"]["shuffle_write"]
                     / max(srows[n]["x1"]["shuffle_write"], 1), 2)
            for n in stress_names
        }

    lines += [
        "",
        f"Wall: {time.time() - wall0:.1f}s, single sample per cell (byte "
        "counters are deterministic given the plan, unlike timings).",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")

    summary = {
        "metric": "shuffle_audit",
        "sfs": sfs,
        "worst_growth_query": worst,
        "worst_growth": round(wg, 2) if wg is not None else None,
        "total_shuffle_mb": {
            sf: round(sum(mb(rows[n][sf]["shuffle_write"]) for n in names), 1) for sf in sfs
        },
        "total_input_mrows": {
            sf: round(sum(rows[n][sf]["input_rows"] for n in names) / 1e6, 2) for sf in sfs
        },
    }
    if x10_summary is not None:
        summary["x10_shuffle_growth"] = x10_summary
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
