"""Pre-staged registry candidates for round 15 — implemented and
oracle-tested now, NOT yet registered (the correctness-window rotation
budget is <=4 new rows per round, SURVEY §10.5; round 14 lifts
tools/staging_r14.py, round 15 lifts this module — the staging pipeline
runs two rounds ahead, same playbook as the r12/r13 lifts).

Each entry mirrors the registry contract exactly: a ``(spark, sf_dir) ->
DataFrame`` callable plus a DuckDB oracle SQL string with matching column
names. ``tests/test_staging_r15.py`` runs the driver-gate
normalize-and-compare at sf0.001; verify once at sf0.01 before lifting.

Staged rows (all surfaces absent from the current 203 + the staged r14
four):
  - bitmap_gsets_distinct — exact distinct counts across GROUPING-SET
    levels from ONE pass of mergeable bitmap partials: the finest
    (event_type, week) bitmaps are built once, then OR-merged up to
    (event_type) and the grand total.  count(distinct) under grouping
    sets makes Spark EXPAND the input once per grouping set; the bitmap
    family replaces that with partial-merge — the 100 TB shape for
    multi-level exact distinct.  Oracle: plain count(distinct) per
    GROUPING SETS level (DuckDB computes each level independently —
    ground truth, no bitmaps).
  - lateral_alias_chain — Spark 4 lateral column aliases chained three
    deep in an aggregate SELECT (each derived column references earlier
    aliases in the SAME select list).  All-integer derivations so
    cross-engine equality is exact; the oracle recomputes every level as
    explicitly nested expressions — ground truth without LCA.
  - geo_grid_rollup — H3-style hierarchical geo bucketing on lat/lon
    synthesized deterministically from c_custkey (no geo lib in the
    container; the grid math is the Spark-side surface being tested):
    fine res-2 cells (1.8-milli-degree steps) aggregate customers and
    balances, then the res-1 level MERGES the res-2 partials — the
    two-level rollup exercises hierarchical re-aggregation where the
    parent level reads child partials, not base data.  Oracle recomputes
    res-1 directly from the base table, so the merge path is checked
    against a no-merge derivation.
  - activity_streaks — gaps-and-islands: longest run of CONSECUTIVE
    active days per user via the classic day_index - row_number island
    key.  Two window functions + two aggregations, all integer; both
    engines implement the standard window semantics independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table


def bitmap_gsets_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per (event_type, week), per (event_type), and
    overall — three grouping-set levels from ONE bitmap-partial pass.
    The finest bitmaps shuffle once on (event_type, week, bucket) with
    constant 4 KB cell state; the coarser levels OR-merge those partials
    (bit-set union is lossless), never re-reading base data — unlike
    count(distinct) under GROUPING SETS, which expands the scan per
    level. NULL level markers follow the SQL grouping-sets convention so
    the oracle's GROUPING SETS output matches shape exactly."""
    from kafka_custom_transforms_spark.functions.bitmap import (
        bucket_bitmaps,
        distinct_counts,
        merge_bitmaps,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        (
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("long")
        ).alias("day_i"),
    ).select(
        "event_type", "user_id", F.expr("day_i div 7").alias("week")
    )
    bm = bucket_bitmaps(ev, "user_id", ["event_type", "week"])
    lvl2 = distinct_counts(bm, ["event_type", "week"])
    lvl1 = distinct_counts(merge_bitmaps(bm, ["event_type"]), ["event_type"]).select(
        "event_type", F.lit(None).cast("long").alias("week"), "n_distinct"
    )
    lvl0 = distinct_counts(merge_bitmaps(bm, []), []).select(
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("long").alias("week"),
        "n_distinct",
    )
    return lvl2.select("event_type", "week", "n_distinct").unionByName(lvl1).unionByName(lvl0)


def lateral_alias_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases chained three deep inside an aggregate
    SELECT — each derived column references aliases defined earlier in
    the same list (Spark 4 LCA resolution), so the query reads as a
    spreadsheet instead of three nested subqueries. Integer divisions
    keep every value exact cross-engine. One shuffle (the GROUP BY);
    the chain is pure post-aggregation projection."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("kcts_li_lca")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS cnt,
               cast(sum(l_quantity) AS bigint) AS sum_qty,
               sum_qty * 1000 div cnt AS qty_milli_per_line,
               qty_milli_per_line div 5000 AS qty_bucket,
               qty_bucket * 5 + 1 AS qty_code
        FROM kcts_li_lca
        GROUP BY l_returnflag, l_linestatus
        """
    )


# Grid constants: steps in milli-degrees; res-1 cells split into 5x5
# res-2 children (9000 = 5 * 1800), the H3-style parent/child relation
# expressed on a square grid (the container has no H3 lib — the surface
# under test is the hierarchical re-aggregation, not the hex math).
_GEO_STEP1 = 9000
_GEO_STEP2 = 1800


def geo_grid_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical geo rollup: synthesize (lat, lon) per customer from
    c_custkey (deterministic modular spread, non-negative so integer
    division is floor in both engines), aggregate balances into fine
    res-2 cells, then MERGE the res-2 partials up to res-1 parents —
    n_child_cells counts occupied children, the partial-merge evidence.
    At 100 TB this is the standard two-level pattern: the fine level
    shuffles once on the cell key; the parent level re-aggregates
    cell-count-bounded partials, never base rows."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 180000).alias("lat_m"),
        ((F.col("c_custkey") * 104729) % 360000).alias("lon_m"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    res2 = (
        cust.select(
            (
                F.expr(f"lat_m div {_GEO_STEP2}") * 1000
                + F.expr(f"lon_m div {_GEO_STEP2}")
            ).alias("cell2"),
            (
                F.expr(f"lat_m div {_GEO_STEP1}") * 1000
                + F.expr(f"lon_m div {_GEO_STEP1}")
            ).alias("cell1"),
            "bal_cents",
        )
        .groupBy("cell1", "cell2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum("bal_cents").alias("sum_bal_cents"),
        )
    )
    return res2.groupBy("cell1").agg(
        F.sum("n_cust").cast("long").alias("n_cust"),
        F.sum("sum_bal_cents").alias("sum_bal_cents"),
        F.count(F.lit(1)).cast("long").alias("n_child_cells"),
    )


def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (gaps and
    islands): distinct active days -> island key day_i - row_number ->
    per-island lengths -> per-user max. All integers; windows partition
    by user so every step is one co-partitioned exchange. The classic
    retention metric a training-data/events pipeline reports at scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day_i"),
    )
    days = ev.distinct()
    w = Window.partitionBy("user_id").orderBy("day_i")
    islands = days.withColumn(
        "isl", F.col("day_i") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "isl").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("max_streak"),
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


STAGED = {
    "bitmap_gsets_distinct": bitmap_gsets_distinct,
    "lateral_alias_chain": lateral_alias_chain,
    "geo_grid_rollup": geo_grid_rollup,
    "activity_streaks": activity_streaks,
}

STAGED_ORACLES = {
    # Ground truth: count(distinct) per GROUPING SETS level, each level
    # computed independently by DuckDB — no bitmaps on the oracle side.
    "bitmap_gsets_distinct": """
        WITH base AS (
          SELECT event_type, user_id,
                 date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) // 7
                   AS week
          FROM events
        )
        SELECT event_type, cast(week AS BIGINT) AS week,
               cast(count(DISTINCT user_id) AS BIGINT) AS n_distinct
        FROM base
        GROUP BY GROUPING SETS ((event_type, week), (event_type), ())
    """,
    # Every LCA level recomputed as explicitly nested expressions.
    "lateral_alias_chain": """
        WITH g AS (
          SELECT l_returnflag, l_linestatus,
                 cast(count(*) AS BIGINT) AS cnt,
                 cast(sum(l_quantity) AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus, cnt, sum_qty,
               sum_qty * 1000 // cnt AS qty_milli_per_line,
               (sum_qty * 1000 // cnt) // 5000 AS qty_bucket,
               ((sum_qty * 1000 // cnt) // 5000) * 5 + 1 AS qty_code
        FROM g
    """,
    # Res-1 recomputed DIRECTLY from base rows (no res-2 intermediate),
    # so the Spark side's partial-merge path is checked against a
    # no-merge derivation.
    "geo_grid_rollup": """
        WITH pts AS (
          SELECT (c_custkey * 7919) % 180000 AS lat_m,
                 (c_custkey * 104729) % 360000 AS lon_m,
                 cast(round(c_acctbal * 100) AS BIGINT) AS bal_cents
          FROM customer
        )
        SELECT cast((lat_m // 9000) * 1000 + (lon_m // 9000) AS BIGINT) AS cell1,
               cast(count(*) AS BIGINT) AS n_cust,
               cast(sum(bal_cents) AS BIGINT) AS sum_bal_cents,
               cast(count(DISTINCT (lat_m // 1800) * 1000 + (lon_m // 1800))
                    AS BIGINT) AS n_child_cells
        FROM pts
        GROUP BY 1
    """,
    "activity_streaks": """
        WITH days AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '2024-01-01', cast(ts AS DATE))
                   AS day_i
          FROM events
        ),
        islands AS (
          SELECT user_id,
                 day_i - row_number() OVER (PARTITION BY user_id
                                            ORDER BY day_i) AS isl
          FROM days
        ),
        streaks AS (
          SELECT user_id, isl, cast(count(*) AS BIGINT) AS len
          FROM islands GROUP BY user_id, isl
        )
        SELECT user_id,
               max(len) AS max_streak,
               cast(sum(len) AS BIGINT) AS n_active_days,
               cast(count(*) AS BIGINT) AS n_streaks
        FROM streaks
        GROUP BY user_id
    """,
}
