#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized (count) to force execution end-to-end.
A warm-up pass on a trivial query absorbs one-time JVM/codegen cost so the
numbers measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod
from kafka_custom_transforms_spark.session import get_spark

BENCH_QUERIES = (
    "smt_chain_envelope",
    "smt_drop_struct",
    "smt_hoist_struct",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "window_top_orders",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "events_sessionize",
    "similarity_topk",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "text_token_stats",
    "text_fingerprint",
    "text_rollup",
    "multimodal_stats",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("kcts-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # Warm up the session (scan codepaths, codegen of a trivial plan).
    queries["text_token_stats"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        queries[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
