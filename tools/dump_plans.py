#!/usr/bin/env python
"""Dump `.explain('formatted')` for bench queries into plans/r<N>/.

    PYTHONPATH=/root/repo python tools/dump_plans.py --suffix before \
        [--round 15] [--sf /root/testdata/sf0.1] [--only name1,name2]

Writes plans/r<N>/<query>_<suffix>.txt — the before/after plan evidence
the optimization round commits alongside OPTIMIZATION_r<N>.md.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--round", type=int, default=15)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import __spark_entry__ as em
    import bench
    from kafka_custom_transforms_spark.plans.explain import plan_str
    from kafka_custom_transforms_spark.session import get_spark

    spark = get_spark("kcts-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    names = (
        [n for n in args.only.split(",") if n]
        if args.only
        else list(bench.BENCH_QUERIES)
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{args.round}",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            plan = plan_str(qs[name](spark, args.sf))
        except Exception as e:  # keep going: one failed build must not hide the rest
            plan = f"PLAN BUILD FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{args.suffix}.txt"), "w") as f:
            f.write(plan.rstrip() + "\n")
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
