#!/usr/bin/env python
"""Interleaved A/B for the r16 fixed-overhead candidates.

Variants are defined INLINE (old vs new shape) so both run in one session
and host drift hits them equally. Per-sample steal deltas printed (r16
standing rule: no conclusion pinned from steal-era samples).

    PYTHONPATH=/root/repo python tools/ab_r16_fixed_overhead.py cte cms bitmap --n 7
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HZ = os.sysconf("SC_CLK_TCK")
SF = "/root/testdata/sf0.1"


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


_CTE_OLD = """
WITH RECURSIVE walk (doc_id, depth) AS (
  SELECT doc_id, 0 FROM {docs} WHERE doc_id = 0
  UNION ALL
  SELECT d.doc_id, w.depth + 1
  FROM walk w
  JOIN {docs} d
    ON d.doc_id >= 1 AND CAST(floor((d.doc_id - 1) / 2) AS BIGINT) = w.doc_id
)
SELECT w.depth AS depth,
       cast(count(*) AS bigint)       AS n_docs,
       cast(sum(d.n_chars) AS bigint) AS sum_chars
FROM walk w JOIN {docs} d ON d.doc_id = w.doc_id
GROUP BY w.depth
"""

_CTE_NEW = """
WITH RECURSIVE walk (doc_id, depth) AS (
  SELECT doc_id, CASE WHEN doc_id = 0 THEN 0 ELSE 1 END
  FROM {docs} WHERE doc_id BETWEEN 0 AND 2
  UNION ALL
  SELECT g.doc_id, w.depth + 2
  FROM walk w
  JOIN {docs} c
    ON c.doc_id >= 1 AND CAST(floor((c.doc_id - 1) / 2) AS BIGINT) = w.doc_id
  JOIN {docs} g
    ON g.doc_id >= 1 AND CAST(floor((g.doc_id - 1) / 2) AS BIGINT) = c.doc_id
)
SELECT w.depth AS depth,
       cast(count(*) AS bigint)       AS n_docs,
       cast(sum(d.n_chars) AS bigint) AS sum_chars
FROM walk w JOIN {docs} d ON d.doc_id = w.doc_id
GROUP BY w.depth
"""


def _cte(spark, sql_text):
    from pyspark.sql import functions as F

    from kafka_custom_transforms_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    cp = docs.localCheckpoint(eager=True)
    cp.createOrReplaceTempView("kcts_docs_rec_ab")
    n_docs = cp.count()
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(max(1_000_000, 2 * n_docs)))
    return spark.sql(sql_text.format(docs="kcts_docs_rec_ab"))


def _cms(spark, combined: bool):
    from pyspark.sql import functions as F

    from kafka_custom_transforms_spark.sources.tables import load_table

    MAX_CMS_KEYS = 1024
    ev = (
        load_table(spark, SF, "events")
        .select("event_type")
        .where(F.col("event_type").isNotNull())
    )
    eps, conf, seed = 0.001, 0.99, 42
    cm_expr = F.expr(
        f"count_min_sketch(event_type, cast({eps} as double),"
        f" cast({conf} as double), {seed})"
    ).alias("sk")
    if combined:
        ev = ev.localCheckpoint(eager=False)
        head = ev.agg(
            cm_expr,
            F.slice(
                F.sort_array(F.collect_set("event_type")), 1, MAX_CMS_KEYS + 1
            ).alias("keys"),
        ).collect()[0]
        sk, keys = head.sk, list(head.keys)
    else:
        sk = ev.agg(cm_expr).collect()[0].sk
        keys = [
            r.event_type
            for r in ev.select("event_type").distinct().limit(MAX_CMS_KEYS + 1).collect()
        ]
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(sk))
    bound = float(eps) * cms.totalCount()
    est_map = F.create_map(
        *[
            x
            for t in keys
            for x in (F.lit(t), F.lit(int(cms.estimateCount(t))).cast("long"))
        ]
    )
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "event_type",
            "n",
            (
                (est_map[F.col("event_type")] >= F.col("n"))
                & (est_map[F.col("event_type")] <= F.col("n") + F.lit(bound))
            ).alias("cms_ok"),
        )
    )


def _bitmap(spark, checkpoint: bool):
    from pyspark.sql import functions as F

    from kafka_custom_transforms_spark.functions.bitmap import (
        bucket_bitmaps,
        distinct_counts,
        merge_bitmaps,
    )
    from kafka_custom_transforms_spark.sources.tables import load_table

    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type").isNotNull())
        .select("event_type", "user_id", F.date_trunc("day", F.col("ts")).alias("day"))
    )
    if checkpoint:
        ev = ev.localCheckpoint(eager=False)
    direct = distinct_counts(
        bucket_bitmaps(ev, "user_id", ["event_type"]), ["event_type"], "n_exact"
    )
    daily = bucket_bitmaps(ev, "user_id", ["event_type", "day"])
    merged = distinct_counts(
        merge_bitmaps(daily, ["event_type"]), ["event_type"], "n_merged"
    )
    return direct.join(F.broadcast(merged), "event_type").select(
        "event_type",
        "n_exact",
        (F.col("n_exact") == F.col("n_merged")).alias("merge_lossless"),
    )


VARIANTS = {
    "cte": [("cte_old", lambda s: _cte(s, _CTE_OLD)), ("cte_new", lambda s: _cte(s, _CTE_NEW))],
    "cms": [("cms_2scan", lambda s: _cms(s, False)), ("cms_1scan", lambda s: _cms(s, True))],
    "bitmap": [
        ("bitmap_2scan", lambda s: _bitmap(s, False)),
        ("bitmap_ckpt", lambda s: _bitmap(s, True)),
    ],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("groups", nargs="+", choices=sorted(VARIANTS))
    ap.add_argument("--n", type=int, default=7)
    args = ap.parse_args()

    from kafka_custom_transforms_spark.session import get_spark

    spark = get_spark("kcts-ab-r16")
    spark.sparkContext.setLogLevel("ERROR")
    pairs = [v for g in args.groups for v in VARIANTS[g]]
    # warm-up every variant once (codegen, python workers)
    for name, fn in pairs:
        fn(spark).count()

    samples: dict[str, list[float]] = {name: [] for name, _ in pairs}
    checks: dict[str, int] = {}
    for i in range(args.n):
        for name, fn in pairs:
            spark.sparkContext.setJobDescription(f"ab:{name}#{i}")
            s0 = _steal()
            t0 = time.time()
            n = fn(spark).count()
            dt = time.time() - t0
            st = (_steal() - s0) / _HZ
            samples[name].append(dt)
            checks[name] = n
            print(f"{name} i={i} t={dt:.3f}s steal={st:.2f}core-s n={n}", flush=True)
    for name, _ in pairs:
        xs = samples[name]
        print(
            f"RESULT {name}: median={statistics.median(xs):.3f} "
            f"min={min(xs):.3f} max={max(xs):.3f} n_rows={checks[name]}"
        )


if __name__ == "__main__":
    main()
