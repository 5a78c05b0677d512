"""Pre-staged registry candidates for round 19 — implemented and
oracle-tested now, NOT yet registered (the correctness-window rotation
budget is <=4 new rows per round, SURVEY §10.5; rounds 14-18 lift their
own staged modules first — the staging pipeline stays ahead of the lift
cadence).

Each entry mirrors the registry contract exactly: a ``(spark, sf_dir) ->
DataFrame`` callable plus a DuckDB oracle SQL string with matching column
names. ``tests/test_staging_r19.py`` runs the driver-gate
normalize-and-compare at sf0.001; verify once at sf0.01 before lifting.

Staged rows (all surfaces absent from the current 203 + the staged
r14-r18 twenty):
  - events_cumulative_users — the distinct-user growth curve: per day,
    NEW users (first-seen that day) and the running cumulative total.
    First-seen is one min-aggregate per user; the running sum's window
    runs over the POST-AGGREGATE day series — bounded by the calendar,
    never by the event count.  The classic corpus-growth dashboard
    metric, exact (no sketches) because first-seen collapses the input
    to one row per user before anything unbounded happens.
  - cohort_retention_d1_d7 — calendar-cohort retention: users who first
    appeared on day d, how many were active again at d+1 and d+7.  One
    user-keyed join of first-seen against the distinct activity frame,
    then conditional count-distincts per cohort — no per-offset rescan
    (the k offsets are CASE branches of the same join, so adding D30
    costs zero extra shuffles).  Complements the staged
    bitmap_retention (adjacent weeks, mergeable partials) with the
    cohort-anchored shape.
  - order_extremes — the min_by/max_by aggregate surface: per order
    priority, the order key holding the maximum (and minimum) value,
    with the ordering key made UNIQUE by a (cents, orderkey) struct so
    ties cannot make the result engine-dependent.  The oracle derives
    the same extremes with rank windows — an independent formulation,
    not DuckDB's arg_max.
  - rfm_segments — the RFM composite: per customer recency (last order
    day), frequency (order count), monetary (exact cents), each cut
    into ntile(4) with a custkey tiebreak making every tile assignment
    deterministic, composed into a 3-digit segment and histogrammed.
    The three global ntile windows run over the per-CUSTOMER aggregate
    frame (the ntile_customer_quartiles precedent — customer-domain
    windows, not event-domain); both engines implement ntile's
    larger-groups-first contract identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table


def _user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("cast(datediff(to_date(ts), date'2024-01-01') as long)").alias(
                "day"
            ),
        )
        .distinct()
    )


def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: new (first-seen) users and the cumulative distinct-user
    total.  The running-sum window orders the day SERIES (calendar-
    bounded), not event rows."""
    ud = _user_days(spark, sf_dir)
    first_seen = ud.groupBy("user_id").agg(F.min("day").alias("d0"))
    new_by_day = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    days = ud.select("day").distinct()
    series = days.join(F.broadcast(new_by_day), "day", "left").select(
        "day", F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return series.select(
        "day", "n_new", F.sum("n_new").over(w).cast("long").alias("cum_users")
    )


def cohort_retention_d1_d7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per first-seen cohort day: cohort size and the users active again
    exactly at d0+1 and d0+7."""
    ud = _user_days(spark, sf_dir)
    first_seen = ud.groupBy("user_id").agg(F.min("day").alias("d0"))
    j = first_seen.join(ud, "user_id")
    return j.groupBy("d0").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.countDistinct(
            F.when(F.col("day") == F.col("d0") + 1, F.col("user_id"))
        )
        .cast("long")
        .alias("retained_d1"),
        F.countDistinct(
            F.when(F.col("day") == F.col("d0") + 7, F.col("user_id"))
        )
        .cast("long")
        .alias("retained_d7"),
    )


def order_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by per priority with a tie-proof (cents, orderkey)
    ordering struct."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    return o.groupBy("prio").agg(
        F.expr("max_by(k, struct(c, k))").cast("long").alias("top_order"),
        F.expr("min_by(k, struct(c, k))").cast("long").alias("bottom_order"),
        F.max("c").alias("max_cents"),
        F.min("c").alias("min_cents"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def _ntile4_from_rank(rn, n: int):
    """Exact SQL ntile(4) bucket from a 1-based rank over n rows: the
    first n%4 buckets hold ceil(n/4) rows, the rest floor(n/4) — pure
    integer expressions, no window."""
    base, rem = n // 4, n % 4
    big = rem * (base + 1)
    if base == 0:  # n < 4: every row lands in bucket rn
        return rn.cast("long")
    # floor() of a positive double ratio is the exact integer quotient
    # while counts stay under 2^53 — far beyond any customer cardinality
    return (
        F.when(rn <= big, F.floor((rn - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((rn - big - 1) / base) + 1)
        .cast("long")
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile segments over the per-customer aggregate frame.

    ntile(4) with an empty PARTITION BY is the one-task anti-scale window
    shape (customer cardinality is 15M rows at sf100 — one sort task each,
    x3 orderings), so the quartiles are derived distributively instead
    (r13 advice): rank each ordering with functions/ordinal.global_ordinal
    (measured-crossover auto-dispatch — bounded window below ~64 MB plan
    size, range-partitioned distributed ordinal above), then map rank ->
    bucket with the exact ntile fill formula in pure expressions. Each
    ordering is made total by the o_custkey tie-break, so the segments are
    bit-identical to the oracle's ntile. One scalar count() sizes the
    formula (bounded output, same pattern as rank.py:58)."""
    from kafka_custom_transforms_spark.functions.ordinal import global_ordinal

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "cast(datediff(to_date(o_orderdate), date'1992-01-01') as long)"
        ).alias("oday"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cust = o.groupBy("o_custkey").agg(
        F.max("oday").alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents_total"),
    )
    n = cust.count()
    # Ascending struct keys encode each DESC-value / ASC-custkey ordering.
    keyed = (
        cust.withColumn("_rk", F.struct((-F.col("last_day")).alias("v"), F.col("o_custkey").alias("k")))
        .withColumn("_fk", F.struct((-F.col("n_orders")).alias("v"), F.col("o_custkey").alias("k")))
        .withColumn("_mk", F.struct((-F.col("cents_total")).alias("v"), F.col("o_custkey").alias("k")))
    )
    ranked = global_ordinal(keyed, "_rk", out_col="_rrn")
    ranked = global_ordinal(ranked, "_fk", out_col="_frn")
    ranked = global_ordinal(ranked, "_mk", out_col="_mrn")
    seg = (
        _ntile4_from_rank(F.col("_rrn"), n) * 100
        + _ntile4_from_rank(F.col("_frn"), n) * 10
        + _ntile4_from_rank(F.col("_mrn"), n)
    ).cast("long").alias("segment")
    return (
        ranked.select(seg, "cents_total")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum("cents_total").cast("long").alias("sum_cents"),
        )
    )


STAGED = {
    "events_cumulative_users": events_cumulative_users,
    "cohort_retention_d1_d7": cohort_retention_d1_d7,
    "order_extremes": order_extremes,
    "rfm_segments": rfm_segments,
}

STAGED_ORACLES = {
    "events_cumulative_users": """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) AS day
          FROM events
        ),
        fs AS (SELECT user_id, min(day) AS d0 FROM ud GROUP BY user_id),
        nbd AS (SELECT d0 AS day, cast(count(*) AS BIGINT) AS n_new
                FROM fs GROUP BY d0),
        days AS (SELECT DISTINCT day FROM ud)
        SELECT cast(days.day AS BIGINT) AS day,
               cast(coalesce(nbd.n_new, 0) AS BIGINT) AS n_new,
               cast(sum(coalesce(nbd.n_new, 0)) OVER (ORDER BY days.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_users
        FROM days LEFT JOIN nbd ON nbd.day = days.day
    """,
    "cohort_retention_d1_d7": """
        WITH ud AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) AS day
          FROM events
        ),
        fs AS (SELECT user_id, min(day) AS d0 FROM ud GROUP BY user_id)
        SELECT cast(fs.d0 AS BIGINT) AS d0,
               cast(count(DISTINCT fs.user_id) AS BIGINT) AS n_users,
               cast(count(DISTINCT CASE WHEN ud.day = fs.d0 + 1
                                        THEN fs.user_id END) AS BIGINT)
                 AS retained_d1,
               cast(count(DISTINCT CASE WHEN ud.day = fs.d0 + 7
                                        THEN fs.user_id END) AS BIGINT)
                 AS retained_d7
        FROM fs JOIN ud ON ud.user_id = fs.user_id
        GROUP BY fs.d0
    """,
    # Independent derivation with rank windows — NOT DuckDB's arg_max —
    # so the min_by/max_by builtins are checked against ground truth.
    "order_extremes": """
        WITH o AS (
          SELECT o_orderpriority AS prio, o_orderkey AS k,
                 cast(round(o_totalprice * 100) AS BIGINT) AS c
          FROM orders
        ),
        rk AS (
          SELECT prio, k, c,
                 row_number() OVER (PARTITION BY prio ORDER BY c DESC, k DESC)
                   AS rmax,
                 row_number() OVER (PARTITION BY prio ORDER BY c ASC, k ASC)
                   AS rmin
          FROM o
        )
        SELECT prio,
               cast(max(CASE WHEN rmax = 1 THEN k END) AS BIGINT) AS top_order,
               cast(max(CASE WHEN rmin = 1 THEN k END) AS BIGINT) AS bottom_order,
               max(c) AS max_cents, min(c) AS min_cents,
               cast(count(*) AS BIGINT) AS n
        FROM rk GROUP BY prio
    """,
    "rfm_segments": """
        WITH o AS (
          SELECT o_custkey,
                 date_diff('day', DATE '1992-01-01', cast(o_orderdate AS DATE))
                   AS oday,
                 cast(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        cust AS (
          SELECT o_custkey, max(oday) AS last_day,
                 cast(count(*) AS BIGINT) AS n_orders,
                 cast(sum(cents) AS BIGINT) AS cents_total
          FROM o GROUP BY o_custkey
        ),
        tiles AS (
          SELECT cents_total,
                 ntile(4) OVER (ORDER BY last_day DESC, o_custkey) AS r,
                 ntile(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f,
                 ntile(4) OVER (ORDER BY cents_total DESC, o_custkey) AS m
          FROM cust
        )
        SELECT cast(r * 100 + f * 10 + m AS BIGINT) AS segment,
               cast(count(*) AS BIGINT) AS n_cust,
               cast(sum(cents_total) AS BIGINT) AS sum_cents
        FROM tiles GROUP BY 1
    """,
}
