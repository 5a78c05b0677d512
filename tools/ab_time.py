#!/usr/bin/env python
"""Interleaved per-query wall timing for optimization A/B work.

    PYTHONPATH=/root/repo python tools/ab_time.py name1 [name2 ...] \
        [--n 5] [--sf /root/testdata/sf0.1] [--noop]

Times each named ``queries()`` row ``--n`` times, interleaved round-robin
(A B A B ...) so host drift hits all variants equally, with a fresh
DataFrame build per sample (bench.py convention — plan/codegen cost is
part of the row). Prints per-query median/min/max. ``--noop`` times
``df.write.format("noop")`` (guide §1.4: forces every column) instead of
the bench's ``.count()``; the default stays ``.count()`` so numbers are
comparable with bench.py / BENCH_r*_repro.json.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as em
    from kafka_custom_transforms_spark.session import get_spark

    spark = get_spark("kcts-ab-time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    for name in args.names:
        if name not in qs:
            raise SystemExit(f"unknown query: {name}")
    # warm-up: scan codepaths + codegen of a trivial plan (bench.py does this)
    qs["text_token_stats"](spark, args.sf).count()

    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for i in range(args.n):
        for name in args.names:
            spark.sparkContext.setJobDescription(f"ab:{name}#{i}")
            # bench.py parity: the DataFrame BUILD (plan construction,
            # parquet footer reads, eager checkpoint preludes) is inside
            # the timed region — queries[name](...).count() is one timed
            # expression there.
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples[name].append(time.time() - t0)
    for name in args.names:
        s = samples[name]
        print(
            f"{name}: median={statistics.median(s):.3f} "
            f"min={min(s):.3f} max={max(s):.3f} n={len(s)} "
            f"all={[round(x, 3) for x in s]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
