"""Pre-staged registry candidates for round 17 — implemented and
oracle-tested now, NOT yet registered (the correctness-window rotation
budget is <=4 new rows per round, SURVEY §10.5; rounds 14/15/16 lift
their own staged modules first — the staging pipeline stays two rounds
ahead).

Each entry mirrors the registry contract exactly: a ``(spark, sf_dir) ->
DataFrame`` callable plus a DuckDB oracle SQL string with matching column
names. ``tests/test_staging_r17.py`` runs the driver-gate
normalize-and-compare at sf0.001; verify once at sf0.01 before lifting.

Staged rows (all surfaces absent from the current 203 + the staged
r14/r15/r16 twelve):
  - event_paths_daily — funnel-mining path frequencies: each (user, day)
    session's time-ordered event-type sequence is folded into ONE path
    string (listagg WITHIN GROUP — ordered, deterministic via the
    (ts, event_id) tiebreak), then a second aggregate counts sessions
    and distinct users per PATH.  Two shuffles; the second keys on the
    path string whose cardinality is bounded by session count, with
    map-side partials collapsing repeats.
  - basket_pairs_events — pairwise co-occurrence (market-basket): which
    event types appear together in the same (user, day) basket.  The
    distinct item frame self-joins on the BASKET key — co-partitioned
    equi-join, no cross join — and `type_a < type_b` keeps each pair
    once.  Per-basket fan-out is C(t,2) with t bounded by the event-type
    vocabulary, NOT by basket row count, so the blow-up is a constant
    factor at any corpus size.
  - interval_coverage_events — sweep-line interval-union: merge each
    user's overlapping [start, start+dur) intervals into islands (start
    > running max of all PRIOR ends opens an island) and sum covered
    time exactly.  All integer microseconds; one shuffle on user_id,
    both windows partition-local.  Durations derive from event_id (mod
    7, +1 minute) so the input intervals are deterministic everywhere.
  - mad_order_values — median absolute deviation per order priority in
    exact cents: percentile_disc median, broadcast the 5-row medians
    frame back, percentile_disc of |x - median|.  Two grouped passes;
    the oracle DERIVES percentile_disc's convention (smallest value with
    cume_dist >= 0.5) with windows at BOTH levels rather than trusting
    DuckDB's interpolating median()/mad() builtins (the
    derive-don't-trust discipline of the percentile_cont/order_stats
    rows; the builtins' interpolated values diverge at even group
    sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table


def _daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("cast(datediff(to_date(ts), date'2024-01-01') as long)").alias("day"),
        "ts",
        "event_id",
        "event_type",
    )


def event_paths_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-frequency table over (user, day) sessions: the time-ordered
    event-type sequence as a '>'-joined string, then sessions and
    distinct users per path."""
    ev = _daily_events(spark, sf_dir)
    paths = ev.groupBy("user_id", "day").agg(
        F.expr(
            "listagg(event_type, '>') within group (order by ts, event_id)"
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


def basket_pairs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence counts over (user, day) baskets via a
    basket-key self-equi-join of the distinct item frame."""
    items = (
        _daily_events(spark, sf_dir)
        .select("user_id", "day", "event_type")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    )


def interval_coverage_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact covered time per user after merging overlapping intervals
    (sweep-line islands over integer microseconds)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        "event_id",
    )
    iv = ev.select(
        "user_id",
        "s_us",
        "event_id",
        (F.col("s_us") + (F.col("event_id") % 7 + 1) * F.lit(60_000_000)).alias(
            "e_us"
        ),
    )
    order = [F.col("s_us"), F.col("event_id")]
    prior = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    upto = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.withColumn(
        "new_isl",
        F.when(
            F.col("s_us") > F.coalesce(F.max("e_us").over(prior), F.lit(-(1 << 62))),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("isl", F.sum("new_isl").over(upto))
    islands = flagged.groupBy("user_id", "isl").agg(
        (F.max("e_us") - F.min("s_us")).alias("covered")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum("covered").cast("long").alias("covered_us"),
    )


def mad_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and MAD of order value per priority, in exact cents via
    percentile_disc at both levels (actual data values — no
    interpolation arithmetic to diverge cross-engine)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    o.createOrReplaceTempView("kcts_mad_orders")
    med = spark.sql(
        """
        SELECT prio, cast(count(*) AS BIGINT) AS n,
               cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
                    AS BIGINT) AS median_cents
        FROM kcts_mad_orders GROUP BY prio
        """
    )
    dev = o.join(F.broadcast(med), "prio").select(
        "prio", "n", "median_cents", F.abs(F.col("cents") - F.col("median_cents")).alias("dev")
    )
    dev.createOrReplaceTempView("kcts_mad_devs")
    return spark.sql(
        """
        SELECT prio AS o_orderpriority, first(n) AS n,
               first(median_cents) AS median_cents,
               cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)
                    AS BIGINT) AS mad_cents
        FROM kcts_mad_devs GROUP BY prio
        """
    )


STAGED = {
    "event_paths_daily": event_paths_daily,
    "basket_pairs_events": basket_pairs_events,
    "interval_coverage_events": interval_coverage_events,
    "mad_order_values": mad_order_values,
}

STAGED_ORACLES = {
    "event_paths_daily": """
        WITH paths AS (
          SELECT user_id,
                 date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) AS day,
                 string_agg(event_type, '>' ORDER BY ts, event_id) AS path
          FROM events GROUP BY user_id, day
        )
        SELECT path, cast(count(*) AS BIGINT) AS n_sessions,
               cast(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM paths GROUP BY path
    """,
    "basket_pairs_events": """
        WITH items AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) AS day,
                 event_type
          FROM events
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               cast(count(*) AS BIGINT) AS n_baskets
        FROM items a
        JOIN items b ON b.user_id = a.user_id AND b.day = a.day
                    AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    """,
    "interval_coverage_events": """
        WITH iv AS (
          SELECT user_id, epoch_us(cast(ts AS TIMESTAMP)) AS s_us, event_id,
                 epoch_us(cast(ts AS TIMESTAMP))
                   + (event_id % 7 + 1) * 60000000 AS e_us
          FROM events
        ),
        flagged AS (
          SELECT user_id, s_us, e_us, event_id,
                 CASE WHEN s_us > coalesce(
                        max(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -4611686018427387904)
                      THEN 1 ELSE 0 END AS new_isl
          FROM iv
        ),
        isl AS (
          SELECT user_id, s_us, e_us,
                 sum(new_isl) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
          FROM flagged
        ),
        islands AS (
          SELECT user_id, isl, max(e_us) - min(s_us) AS covered
          FROM isl GROUP BY user_id, isl
        )
        SELECT user_id, cast(count(*) AS BIGINT) AS n_islands,
               cast(sum(covered) AS BIGINT) AS covered_us
        FROM islands GROUP BY user_id
    """,
    # percentile_disc's convention derived with windows at BOTH levels —
    # never DuckDB's interpolating median()/mad() builtins.
    "mad_order_values": """
        WITH o AS (
          SELECT o_orderpriority AS prio,
                 cast(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        w1 AS (
          SELECT prio, cents,
                 cume_dist() OVER (PARTITION BY prio ORDER BY cents) AS cd
          FROM o
        ),
        med AS (
          SELECT prio, min(cents) AS median_cents
          FROM w1 WHERE cd >= 0.5 GROUP BY prio
        ),
        cnt AS (SELECT prio, cast(count(*) AS BIGINT) AS n FROM o GROUP BY prio),
        d AS (
          SELECT o.prio, abs(o.cents - med.median_cents) AS dev
          FROM o JOIN med ON med.prio = o.prio
        ),
        w2 AS (
          SELECT prio, dev,
                 cume_dist() OVER (PARTITION BY prio ORDER BY dev) AS cd
          FROM d
        ),
        mad AS (
          SELECT prio, min(dev) AS mad_cents
          FROM w2 WHERE cd >= 0.5 GROUP BY prio
        )
        SELECT med.prio AS o_orderpriority, cnt.n, med.median_cents, mad.mad_cents
        FROM med JOIN cnt ON cnt.prio = med.prio JOIN mad ON mad.prio = med.prio
    """,
}
