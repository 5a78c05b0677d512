"""Pre-staged registry candidates for round 16 — implemented and
oracle-tested now, NOT yet registered (the correctness-window rotation
budget is <=4 new rows per round, SURVEY §10.5; round 14 lifts
tools/staging_r14.py, round 15 lifts tools/staging_r15.py, round 16
lifts this module — the staging pipeline stays two rounds ahead).

Each entry mirrors the registry contract exactly: a ``(spark, sf_dir) ->
DataFrame`` callable plus a DuckDB oracle SQL string with matching column
names. ``tests/test_staging_r16.py`` runs the driver-gate
normalize-and-compare at sf0.001; verify once at sf0.01 before lifting.

Staged rows (all surfaces absent from the current 203 + the staged
r14/r15 eight):
  - moments_lineitem — exact distributed skewness and excess kurtosis
    per return flag from integer power sums (the OLS playbook one moment
    deeper): S1..S4 over cast-to-bigint l_quantity are order-independent
    exact sums; the central moments and both shape statistics come from
    ONE closed-form double expression mirrored verbatim in the oracle.
    pow() is avoided (libm variance across engines): skew divides by
    sqrt(m2^3) — IEEE sqrt is correctly rounded everywhere.  The oracle
    does NOT call DuckDB's skewness()/kurtosis() (sample-convention,
    n/(n-1)-corrected); the independent-implementation test converts and
    compares against those builtins separately.
  - event_transitions — first-order Markov transition counts over each
    user's time-ordered event stream: lead() per user, then a bigram
    groupBy.  One shuffle keyed on user_id (window) + one on the bigram
    (aggregate with map-side partials); ties on ts are broken by
    event_id so both engines see the same sequence.
  - bitmap_retention — week-over-week retained users EXACTLY, from
    mergeable bitmap partials via inclusion-exclusion: |A∩B| = |A| +
    |B| - |A∪B|, where the union count OR-merges the same per-(week,
    bucket) bitmaps the per-week counts read — Spark has no bitmap AND,
    and this shape never needs one.  At 100 TB the base table is
    scanned ONCE; retention for every adjacent week pair comes from
    constant-size partials (the self-join alternative re-shuffles all
    user×week rows per pair).  Oracle: plain distinct-user self-join
    between adjacent weeks — ground truth with no bitmaps and no
    inclusion-exclusion.
  - ordinal_assign_docs — contiguous global 1..n numbering of documents
    by doc_id via functions/ordinal.global_ordinal: range-partition,
    pin, per-partition counts -> broadcast offsets, partition-local
    row_number.  The oracle is the single-partition window
    (row_number() OVER (ORDER BY doc_id)) — exactly the plan the
    operator exists to avoid, fine at oracle scale, fatal at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table


def moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis of l_quantity per return flag from
    exact bigint power sums (q <= 50 so q^4 <= 6.25e6 per row; the sums
    stay int64 far past sf100).  One partial/final aggregate pair,
    constant state per group; the double arithmetic happens once per
    GROUP, not per row, and mirrors the oracle token for token."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    )
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
        F.sum(F.col("q") * F.col("q") * F.col("q")).alias("s3"),
        F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q")).alias("s4"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    m2 = r2 - mean * mean
    m3 = r3 - F.lit(3.0) * mean * r2 + F.lit(2.0) * mean * mean * mean
    m4 = (
        r4
        - F.lit(4.0) * mean * r3
        + F.lit(6.0) * mean * mean * r2
        - F.lit(3.0) * mean * mean * mean * mean
    )
    return s.select(
        "l_returnflag",
        "n",
        (m3 / F.sqrt(m2 * m2 * m2)).alias("skew_qty"),
        (m4 / (m2 * m2) - F.lit(3.0)).alias("kurt_qty"),
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type bigram counts over each user's time-ordered stream.
    The lead() window shuffles once on user_id with a partition-local
    (ts, event_id) sort; the bigram aggregate benefits from map-side
    partials because transition cardinality is event_types^2, tiny
    against the row count at any scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )


def bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact adjacent-week retention from one bitmap-partial pass.
    Week w's bitmaps contribute to pair w (as the left week) and pair
    w-1 (as the right week); OR-merging a pair's bitmaps gives
    |A_w ∪ A_w+1| losslessly, and inclusion-exclusion closes the
    intersection without a bitmap AND.  The per-week counts frame is
    weeks-sized — broadcast both joins."""
    from kafka_custom_transforms_spark.functions.bitmap import (
        bucket_bitmaps,
        distinct_counts,
        merge_bitmaps,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("cast(datediff(to_date(ts), date'2024-01-01') as long) div 7").alias(
            "week"
        ),
    )
    bm = bucket_bitmaps(ev, "user_id", ["week"])
    wk = distinct_counts(bm, ["week"], alias="active")
    pairs = bm.withColumn(
        "pair", F.explode(F.array(F.col("week") - 1, F.col("week")))
    )
    union_cnt = distinct_counts(merge_bitmaps(pairs, ["pair"]), ["pair"], alias="u")
    left = wk.select(F.col("week").alias("week_idx"), F.col("active").alias("active_users"))
    right = wk.select((F.col("week") - 1).alias("week_idx"), F.col("active").alias("next_active"))
    return (
        union_cnt.withColumnRenamed("pair", "week_idx")
        .join(F.broadcast(left), "week_idx")
        .join(F.broadcast(right), "week_idx")
        .select(
            "week_idx",
            "active_users",
            (F.col("active_users") + F.col("next_active") - F.col("u"))
            .cast("long")
            .alias("retained_users"),
        )
    )


def ordinal_assign_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 1..n ordinals over documents by doc_id with no
    whole-table single-partition window — functions/ordinal.py has the
    full plan narrative; tests/test_ordinal.py pins that every window in
    the executed plan is either pid-partitioned or over the bounded
    counts frame."""
    from kafka_custom_transforms_spark.functions.ordinal import global_ordinal

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return global_ordinal(docs, "doc_id", n_parts=8)


STAGED = {
    "moments_lineitem": moments_lineitem,
    "event_transitions": event_transitions,
    "bitmap_retention": bitmap_retention,
    "ordinal_assign_docs": ordinal_assign_docs,
}

STAGED_ORACLES = {
    # Same closed form token for token (see module docstring: the
    # CONVENTION-divergent builtins are pinned separately in
    # tests/test_staging_r16.py, converted).
    "moments_lineitem": """
        WITH s AS (
          SELECT l_returnflag,
                 cast(count(*) AS BIGINT) AS n,
                 sum(cast(l_quantity AS BIGINT)) AS s1,
                 sum(cast(l_quantity AS BIGINT) * cast(l_quantity AS BIGINT)) AS s2,
                 sum(cast(l_quantity AS BIGINT) * cast(l_quantity AS BIGINT)
                     * cast(l_quantity AS BIGINT)) AS s3,
                 sum(cast(l_quantity AS BIGINT) * cast(l_quantity AS BIGINT)
                     * cast(l_quantity AS BIGINT) * cast(l_quantity AS BIGINT)) AS s4
          FROM lineitem GROUP BY l_returnflag
        ),
        d AS (
          SELECT l_returnflag, n,
                 cast(s1 AS DOUBLE) / cast(n AS DOUBLE) AS mean,
                 cast(s2 AS DOUBLE) / cast(n AS DOUBLE) AS r2,
                 cast(s3 AS DOUBLE) / cast(n AS DOUBLE) AS r3,
                 cast(s4 AS DOUBLE) / cast(n AS DOUBLE) AS r4
          FROM s
        ),
        m AS (
          SELECT l_returnflag, n,
                 r2 - mean * mean AS m2,
                 r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean AS m3,
                 r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
                    - 3.0 * mean * mean * mean * mean AS m4
          FROM d
        )
        SELECT l_returnflag, n,
               m3 / sqrt(m2 * m2 * m2) AS skew_qty,
               m4 / (m2 * m2) - 3.0 AS kurt_qty
        FROM m
    """,
    "event_transitions": """
        WITH seq AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM events
        )
        SELECT from_type, to_type, cast(count(*) AS BIGINT) AS n_trans
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    """,
    # Ground truth: distinct-user self-join between adjacent weeks — no
    # bitmaps, no inclusion-exclusion on the oracle side.
    "bitmap_retention": """
        WITH wk AS (
          SELECT DISTINCT
                 date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) // 7 AS w,
                 user_id
          FROM events
        ),
        cnt AS (SELECT w, cast(count(*) AS BIGINT) AS c FROM wk GROUP BY w),
        ret AS (
          SELECT a.w, cast(count(*) AS BIGINT) AS r
          FROM wk a JOIN wk b ON b.user_id = a.user_id AND b.w = a.w + 1
          GROUP BY a.w
        )
        SELECT cast(c0.w AS BIGINT) AS week_idx,
               c0.c AS active_users,
               cast(coalesce(r.r, 0) AS BIGINT) AS retained_users
        FROM cnt c0
        JOIN cnt c1 ON c1.w = c0.w + 1
        LEFT JOIN ret r ON r.w = c0.w
    """,
    # The oracle IS the anti-scale plan the operator replaces: a global
    # single-partition window — fine at sf0.01, fatal at 100 TB.
    "ordinal_assign_docs": """
        SELECT doc_id, n_chars,
               cast(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS ordinal
        FROM documents
    """,
}
