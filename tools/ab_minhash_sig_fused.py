#!/usr/bin/env python
"""Interleaved A/B: dedup_minhash_lsh with the split signature stage
(JVM transform(pmod(xxhash64)) HOF -> pandas mod-min; PRODUCTION, the
split ships 8 B/gram longs) vs the fused mapInArrow kernel (xxh64_np
base hashes + chunked reduceat mod-min in one pass; ships ~25 B/gram
strings). Fresh DataFrame build per sample (bench.py convention);
per-sample steal deltas printed (r16 standing rule: no conclusion pinned
from steal-era samples).

OUTCOME (r16, pinned): fused LOSES — sf0.1 sig stage is a wash (0.338 vs
0.332 median), a 20x corpus replica has split winning every pair (0.77
vs 1.07 s sig stage; 0.73 vs 0.97 s with the sets build included).
Spark's xxhash64 is a fast native intrinsic even under the interpreted
HOF, and the fusion's string crossing outweighs the HOF + second
crossing it removes. A batch-flattened minimum.reduceat replacement for
the split form's per-doc mod-min loop ALSO lost (0.78 vs 1.83 s at 20x:
numpy reduceat has no SIMD fast path) — both negatives live in the
texthash docstrings.

    PYTHONPATH=/root/repo python tools/ab_minhash_sig_fused.py [--n 7] [--full]

Default times the SIGNATURE STAGE ONLY (shingle sets -> sig, noop sink);
--full times the whole dedup_minhash_lsh bench row (.count(), bench
methodology) with the stage toggled via monkeypatch.
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
    ap.add_argument("--n", type=int, default=7)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    from kafka_custom_transforms_spark.functions import texthash
    from kafka_custom_transforms_spark.operators import dedup
    from kafka_custom_transforms_spark.session import get_spark
    from kafka_custom_transforms_spark.sources.tables import load_table

    spark = get_spark("kcts-ab-minhash-sig")
    spark.sparkContext.setLogLevel("ERROR")
    perms = texthash.minhash_perms(128)

    def run_stage(fused: bool) -> None:
        docs = load_table(spark, args.sf, "documents")
        sets = dedup.shingle_sets(docs, "doc_id", "text", 3, "arrow").localCheckpoint()
        fn = (
            texthash.minhash_signature_map_fused
            if fused
            else texthash.minhash_signature_map
        )
        fn(sets, perms, input_nonempty=True).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_full(fused: bool) -> None:
        orig = dedup.minhash_signature_map
        if fused:
            dedup.minhash_signature_map = (
                lambda sets, perms, **kw: texthash.minhash_signature_map_fused(
                    sets, perms, **kw
                )
            )
        try:
            docs = load_table(spark, args.sf, "documents")
            dedup.minhash_lsh_pairs(
                docs, shingle_k=3, num_perm=128, bands=32, threshold=0.5
            ).count()
        finally:
            dedup.minhash_signature_map = orig

    run = run_full if args.full else run_stage
    label = "full" if args.full else "sigstage"
    # warm-up both arms once (codegen/session caches hit both equally)
    run(False)
    run(True)
    samples: dict[str, list[float]] = {"split": [], "fused": []}
    for i in range(args.n):
        for name, fused in (("split", False), ("fused", True)):
            spark.sparkContext.setJobDescription(f"ab-{label}:{name}#{i}")
            s0 = _steal()
            t0 = time.time()
            run(fused)
            dt = time.time() - t0
            st = (_steal() - s0) / _HZ
            samples[name].append(dt)
            print(f"{label} {name} i={i} t={dt:.3f}s steal={st:.2f}core-s", flush=True)
    for name, s in samples.items():
        print(
            f"{label} {name}: median={statistics.median(s):.3f} "
            f"min={min(s):.3f} max={max(s):.3f} all={[round(x, 3) for x in s]}",
            flush=True,
        )
    wins = sum(1 for a, b in zip(samples["split"], samples["fused"]) if b < a)
    print(f"fused wins {wins}/{len(samples['split'])} pairs")
    spark.stop()


if __name__ == "__main__":
    main()
