"""Pre-staged registry candidates for round 20 — implemented and
oracle-tested now, NOT yet registered (the correctness-window rotation
budget is <=4 new rows per round, SURVEY §10.5; rounds 14-19 lift their
own staged modules first — with this module the staging runway covers
every remaining round of the build).

Each entry mirrors the registry contract exactly: a ``(spark, sf_dir) ->
DataFrame`` callable plus a DuckDB oracle SQL string with matching column
names. ``tests/test_staging_r20.py`` runs the driver-gate
normalize-and-compare at sf0.001; verify once at sf0.01 before lifting.

Staged rows (all surfaces absent from the current 203 + the staged
r14-r19 twenty-four):
  - weighted_median_qty — the weighted-percentile surface: the median
    of l_extendedprice (cents) per return flag where each row carries
    l_quantity units of weight.  Derived on BOTH sides from the same
    primitive (cumulative weight window, smallest value whose running
    weight reaches half the total) because no engine pair shares a
    weighted-percentile builtin convention; the pure-Python expansion
    model in the tests is the ground truth (expand each row into
    quantity copies, take the lower median).
  - revenue_drawdown — running-peak / drawdown analytics over the daily
    revenue series: cumulative max of revenue-to-date and the gap to
    it, all in exact cents.  Both windows run over the POST-AGGREGATE
    day series (calendar-bounded); the event-volume work is one
    grouped sum.
  - events_locf_daily — forward-fill (last-observation-carried-forward)
    over the full day spine per event type: days with no observation
    inherit the most recent prior day's count.  Spark side uses
    last_value(..., ignorenulls) over an unbounded-preceding window on
    the spine; the oracle derives LOCF independently via a max-prior-
    observed-day self-join — two genuinely different formulations.
  - nation_share_ppm — percent-of-parent at two levels in EXACT parts
    per million (integer div, no floats): each nation's share of its
    region's revenue and each region's share of the total.  Parent
    totals attach via windows over the 25-row per-nation AGGREGATE
    frame — bounded by the nation dim, so the partitionless total
    window is safe at any fact volume; the oracle derives both parents
    with independent grouped CTEs instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table


def weighted_median_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (by l_quantity) lower median of l_extendedprice cents
    per return flag via the cumulative-weight derivation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    cum = Window.partitionBy("l_returnflag").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("l_returnflag")
    # collapse duplicate cents first so the cumulative walk is over
    # distinct values (ties carry summed weight — required for a
    # well-defined "smallest value reaching half the total")
    by_val = li.groupBy("l_returnflag", "cents").agg(F.sum("w").alias("w"))
    walked = by_val.select(
        "l_returnflag",
        "cents",
        F.sum("w").over(cum).alias("cw"),
        F.sum("w").over(tot).alias("tw"),
    )
    return (
        walked.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("cents").alias("wmedian_cents"),
            F.max("tw").cast("long").alias("total_weight"),
        )
    )


def revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event revenue (value in cents), running peak, and drawdown
    — windows over the calendar-bounded day series."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("cast(datediff(to_date(ts), date'2024-01-01') as long)").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    daily = ev.groupBy("day").agg(F.sum("cents").cast("long").alias("revenue_cents"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "revenue_cents",
        F.max("revenue_cents").over(w).cast("long").alias("peak_cents"),
    ).withColumn(
        "drawdown_cents", (F.col("peak_cents") - F.col("revenue_cents")).cast("long")
    )


def events_locf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day) counts over the FULL day spine with gaps
    forward-filled from the last observed day (LOCF); days before a
    type's first observation stay 0."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("cast(datediff(to_date(ts), date'2024-01-01') as long)").alias("day"),
    )
    observed = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # Spine without any keyless join (a literal-true join plans the BNLJ
    # the hygiene guard forbids): global day bounds ride a window over
    # the POST-AGGREGATE observed frame (types x days rows, bounded),
    # then one sequence-explode per type generates its full day span.
    wall = Window.partitionBy(F.lit(1))
    bounds = (
        observed.withColumn("lo", F.min("day").over(wall))
        .withColumn("hi", F.max("day").over(wall))
        .groupBy("event_type")
        .agg(F.first("lo").alias("lo"), F.first("hi").alias("hi"))
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    full = spine.join(observed, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return full.select(
        "event_type",
        "day",
        F.coalesce(F.last("cnt", ignorenulls=True).over(w), F.lit(0))
        .cast("long")
        .alias("cnt_locf"),
        F.when(F.col("cnt").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("observed"),
    )


def nation_share_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer percent-of-parent: nation revenue share of its
    region and region share of the grand total, in parts per million."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum("cents").cast("long").alias("nation_cents"))
    )
    # Parent totals via windows over the 25-row per-nation aggregate
    # frame (bounded by the nation dim, never by fact volume) — a
    # literal-true total join would plan the forbidden BNLJ.
    joined = per_nation.withColumn(
        "region_cents",
        F.sum("nation_cents").over(Window.partitionBy("r_name")).cast("long"),
    ).withColumn(
        "total_cents",
        F.sum("nation_cents").over(Window.partitionBy(F.lit(1))).cast("long"),
    )
    # Widen to decimal(38,0) BEFORE the *1e6: region/total cents reach
    # ~2.3e13 at sf1, so cents*1e6 crosses 2^63 around sf2 and non-ANSI
    # int64 would silently wrap (r13 advice). decimal(38,0) holds the
    # ~20-digit intermediate exactly; the ppm quotient is < 1e6 so the
    # final cast back to long is always safe. The oracle mirrors with
    # hugeint (DuckDB's exact 128-bit integer) — same floor division on
    # positive operands.
    return joined.select(
        "r_name",
        "n_name",
        "nation_cents",
        F.expr(
            "cast(cast(nation_cents AS decimal(38,0)) * 1000000 div region_cents AS long)"
        ).alias("nation_share_ppm"),
        F.expr(
            "cast(cast(region_cents AS decimal(38,0)) * 1000000 div total_cents AS long)"
        ).alias("region_share_ppm"),
    )


STAGED = {
    "weighted_median_qty": weighted_median_qty,
    "revenue_drawdown": revenue_drawdown,
    "events_locf_daily": events_locf_daily,
    "nation_share_ppm": nation_share_ppm,
}

STAGED_ORACLES = {
    # Same cumulative-weight derivation (no engine pair shares a
    # weighted-percentile builtin convention); the tests' pure-Python
    # expansion model is the independent ground truth.
    "weighted_median_qty": """
        WITH li AS (
          SELECT l_returnflag,
                 cast(round(l_extendedprice * 100) AS BIGINT) AS cents,
                 cast(l_quantity AS BIGINT) AS w
          FROM lineitem
        ),
        by_val AS (
          SELECT l_returnflag, cents, sum(w) AS w
          FROM li GROUP BY l_returnflag, cents
        ),
        walked AS (
          SELECT l_returnflag, cents,
                 sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw,
                 sum(w) OVER (PARTITION BY l_returnflag) AS tw
          FROM by_val
        )
        SELECT l_returnflag,
               cast(min(cents) AS BIGINT) AS wmedian_cents,
               cast(max(tw) AS BIGINT) AS total_weight
        FROM walked WHERE cw * 2 >= tw
        GROUP BY l_returnflag
    """,
    "revenue_drawdown": """
        WITH daily AS (
          SELECT cast(date_diff('day', DATE '2024-01-01', cast(ts AS DATE))
                      AS BIGINT) AS day,
                 cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
          FROM events GROUP BY 1
        )
        SELECT day, revenue_cents,
               cast(max(revenue_cents) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS peak_cents,
               cast(max(revenue_cents) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - revenue_cents AS BIGINT) AS drawdown_cents
        FROM daily
    """,
    # Independent LOCF derivation: the carried value comes from the max
    # prior OBSERVED day via a self-join — no ignore-nulls window.
    "events_locf_daily": """
        WITH ev AS (
          SELECT event_type,
                 date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) AS day
          FROM events
        ),
        observed AS (
          SELECT event_type, day, cast(count(*) AS BIGINT) AS cnt
          FROM ev GROUP BY event_type, day
        ),
        bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM observed),
        spine AS (
          SELECT t.event_type, d.day
          FROM (SELECT DISTINCT event_type FROM ev) t,
               (SELECT unnest(generate_series(bounds.lo, bounds.hi)) AS day
                FROM bounds) d
        ),
        src AS (
          SELECT s.event_type, s.day,
                 (SELECT max(o.day) FROM observed o
                  WHERE o.event_type = s.event_type AND o.day <= s.day)
                   AS src_day
          FROM spine s
        )
        SELECT src.event_type, cast(src.day AS BIGINT) AS day,
               cast(coalesce(o.cnt, 0) AS BIGINT) AS cnt_locf,
               cast(CASE WHEN src.src_day = src.day THEN 1 ELSE 0 END
                    AS BIGINT) AS observed
        FROM src
        LEFT JOIN observed o
          ON o.event_type = src.event_type AND o.day = src.src_day
    """,
    "nation_share_ppm": """
        WITH per_nation AS (
          SELECT r.r_name, n.n_name,
                 cast(sum(cast(round(o.o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS nation_cents
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
          GROUP BY r.r_name, n.n_name
        ),
        per_region AS (
          SELECT r_name, cast(sum(nation_cents) AS BIGINT) AS region_cents
          FROM per_nation GROUP BY r_name
        ),
        total AS (SELECT cast(sum(region_cents) AS BIGINT) AS total_cents
                  FROM per_region)
        SELECT pn.r_name, pn.n_name, pn.nation_cents,
               cast(cast(pn.nation_cents AS HUGEINT) * 1000000
                    // pr.region_cents AS BIGINT) AS nation_share_ppm,
               cast(cast(pr.region_cents AS HUGEINT) * 1000000
                    // t.total_cents AS BIGINT) AS region_share_ppm
        FROM per_nation pn
        JOIN per_region pr ON pr.r_name = pn.r_name
        CROSS JOIN total t
    """,
}
