#!/usr/bin/env python
"""Interleaved A/B: embedding_dup_pairs block count at bench SF.

Times the dedup_embedding_cosine bench row's computation with explicit
n_blocks values (fresh DataFrame per sample, bench .count() action),
interleaved so host drift hits all variants equally. Also prints the
steal-jiffy delta per sample so burst-era samples are visible (r15
verdict item 4: no A/B conclusions pinned inside a steal era).

    PYTHONPATH=/root/repo python tools/ab_embedding_blocks.py 1 8 [--n 7]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HZ = os.sysconf("SC_CLK_TCK")


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("blocks", nargs="+", type=int)
    ap.add_argument("--n", type=int, default=7)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from kafka_custom_transforms_spark.operators import dedup
    from kafka_custom_transforms_spark.session import get_spark
    from kafka_custom_transforms_spark.sources.tables import load_table

    spark = get_spark("kcts-ab-embedding")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up (codegen + python worker pool)
    load_table(spark, args.sf, "embeddings").count()
    dedup.embedding_dup_pairs(
        load_table(spark, args.sf, "embeddings"), threshold=0.45, dim=64,
        method="block", n_blocks=args.blocks[0],
    ).count()

    samples: dict[int, list[float]] = {b: [] for b in args.blocks}
    for i in range(args.n):
        for b in args.blocks:
            spark.sparkContext.setJobDescription(f"ab:blocks={b}#{i}")
            s0 = _steal()
            t0 = time.time()
            emb = load_table(spark, args.sf, "embeddings")
            n = dedup.embedding_dup_pairs(
                emb, threshold=0.45, dim=64, method="block", n_blocks=b
            ).count()
            dt = time.time() - t0
            st = (_steal() - s0) / _HZ
            samples[b].append(dt)
            print(f"blocks={b} i={i} t={dt:.3f}s steal={st:.2f}core-s n={n}", flush=True)
    for b in args.blocks:
        xs = samples[b]
        print(
            f"RESULT blocks={b}: median={statistics.median(xs):.3f} "
            f"min={min(xs):.3f} max={max(xs):.3f}"
        )


if __name__ == "__main__":
    main()
