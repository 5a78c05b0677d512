"""Pre-staged registry candidates for round 18 — implemented and
oracle-tested now, NOT yet registered (the correctness-window rotation
budget is <=4 new rows per round, SURVEY §10.5; rounds 14-17 lift their
own staged modules first — the staging pipeline stays ahead of the lift
cadence).

Each entry mirrors the registry contract exactly: a ``(spark, sf_dir) ->
DataFrame`` callable plus a DuckDB oracle SQL string with matching column
names. ``tests/test_staging_r18.py`` runs the driver-gate
normalize-and-compare at sf0.001; verify once at sf0.01 before lifting.

Staged rows (all surfaces absent from the current 203 + the staged
r14-r17 sixteen):
  - chi2_event_weekday — chi-square independence cells for the
    event_type x weekday contingency table: every cell's contribution
    ((N*n - r*c)^2 / (N*r*c)) is ONE closed-form double evaluated from
    exact bigint counts and margins, so there is no float-summation
    order to diverge cross-engine (the moments_lineitem discipline one
    step further: per-cell output, zero float aggregation).  Zero cells
    are materialized via a dummy-key equi join of the two tiny margin
    dims (broadcast hash join, NOT a cross join) because an absent
    observation still contributes its expectation.
  - daily_counts_delta — day-over-day change per event type: aggregate
    to (event_type, day) counts, then lag() over each type's OWN tiny
    ordered series.  The window runs on the post-aggregate frame
    (types x days rows), so its sort is bounded by key cardinality, not
    corpus size — the cheap shape for trend series at any scale.
  - events_asof_forward — forward as-of join with tolerance: for each
    signup event, the NEXT purchase by the same user within one hour
    (the complement of the backward as-of row events_asof_attrib).  One
    shuffle on user_id; the conditional forward scan is a
    first(..., ignorenulls) window over the following frame — no
    self-join.  The oracle derives it independently as min(ts) over a
    tolerance-bounded LEFT JOIN — ground truth with no window at all.
  - bitmask_profiles — bitwise aggregation surface: each (user, day)'s
    event types fold into ONE bigint mask (bit_or of 1 << (ascii(first
    char) mod 16)), then user-days are histogrammed by exact mask.
    Constant per-group state (a single long) — the degenerate-but-useful
    sketch for small categorical alphabets; both engines compute the
    identical mask from the identical deterministic bit mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table


def chi2_event_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell chi-square contributions from exact integer sufficient
    statistics; see module docstring."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.expr("cast(datediff(to_date(ts), date'2024-01-01') as long)") % 7).alias(
            "wd"
        ),
    )
    cells = ev.groupBy("event_type", "wd").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rows = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("r"))
    cols = ev.groupBy("wd").agg(F.count(F.lit(1)).cast("long").alias("c"))
    # The weekday domain is FIXED (0..6), so the types x weekdays grid
    # needs no keyless join at all: explode the literal domain per type
    # (Catalyst constant-folds a dummy-key equi join straight back into
    # the BroadcastNestedLoopJoin the hygiene guard forbids), attach the
    # c margin on the REAL wd key, and recover the grand total as a
    # per-type window sum over the 7 attached margins (sum of all column
    # margins = N; the window frame is 7 rows per type, bounded by the
    # domain, never by data).
    rows7 = rows.withColumn(
        "wd", F.explode(F.array(*[F.lit(i).cast("long") for i in range(7)]))
    )
    grid = rows7.join(F.broadcast(cols), "wd").withColumn(
        "tot", F.sum("c").over(Window.partitionBy("event_type"))
    )
    full = grid.join(F.broadcast(cells), ["event_type", "wd"], "left").select(
        "event_type",
        "wd",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        "r",
        "c",
        "tot",
    )
    # Numerator as a difference of DOUBLE products: tot*n in int64
    # overflows (ANSI: throws) once total events x largest cell crosses
    # ~9.2e18 (roughly 1e9+ rows — exactly the 100 TB regime). Each
    # factor is exact in double far beyond that, and both engines
    # compute the identical IEEE products/difference (r13 advice — the
    # same reasoning that already moved the denominator to double).
    num = (
        F.col("tot").cast("double") * F.col("n").cast("double")
        - F.col("r").cast("double") * F.col("c").cast("double")
    )
    # Denominator as a product of DOUBLES, not bigints: N*r*c in int64
    # overflows (ANSI: throws) around sf10 (1e7 * 3e6 * 1.4e6 > 2^63),
    # while each factor is exact in double far beyond that and the
    # product is the same IEEE value in any engine.
    den = (
        F.col("tot").cast("double") * F.col("r").cast("double") * F.col("c").cast("double")
    )
    return full.select(
        "event_type", "wd", "n", (num * num / den).alias("chi2_contrib")
    )


def daily_counts_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day count deltas per event type (lag over the
    post-aggregate series; first day's delta is NULL)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("cast(datediff(to_date(ts), date'2024-01-01') as long)").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type",
        "day",
        "cnt",
        (F.col("cnt") - F.lag("cnt").over(w)).cast("long").alias("delta"),
    )


def events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each signup's lag (microseconds) to
    the same user's next purchase within one hour, NULL when none."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t_us"),
    )
    # At EQUAL timestamps a purchase must not match (the as-of is strictly
    # forward): sorting purchases BEFORE other rows at the same t_us keeps
    # any equal-ts purchase out of the signup's following frame, exactly
    # mirroring the oracle's strict p.t_us > s.t_us.
    kind = F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(F.lit(1))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us"), kind, F.col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    p_ts = F.when(F.col("event_type") == "purchase", F.col("t_us"))
    flagged = ev.withColumn(
        "next_p_us", F.first(p_ts, ignorenulls=True).over(w)
    )
    return (
        flagged.filter(F.col("event_type") == "signup")
        .select(
            "event_id",
            "user_id",
            F.when(
                F.col("next_p_us") <= F.col("t_us") + F.lit(3_600_000_000),
                F.col("next_p_us") - F.col("t_us"),
            )
            .cast("long")
            .alias("lag_us"),
        )
    )


def bitmask_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users histogrammed by their exact event-type bitmask (bit_or of a
    deterministic 16-slot mapping)."""
    # SQL-expr form: the pyspark F.shiftleft wrapper takes a Python int
    # for numBits, not a Column — the per-row shift must go through the
    # SQL function.
    # Daily masks, not lifetime: over a whole month every user touches
    # every type (one degenerate mask — a 1-row parity check); per
    # (user, day) the mask distribution is real (15 distinct at sf0.01).
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("cast(datediff(to_date(ts), date'2024-01-01') as long)").alias("day"),
        F.expr(
            "shiftleft(cast(1 as bigint), ascii(substring(event_type, 1, 1)) % 16)"
        ).alias("bit"),
    )
    masks = ev.groupBy("user_id", "day").agg(
        F.bit_or("bit").cast("long").alias("mask")
    )
    return masks.groupBy("mask").agg(
        F.count(F.lit(1)).cast("long").alias("n_user_days")
    )


STAGED = {
    "chi2_event_weekday": chi2_event_weekday,
    "daily_counts_delta": daily_counts_delta,
    "events_asof_forward": events_asof_forward,
    "bitmask_profiles": bitmask_profiles,
}

STAGED_ORACLES = {
    # Same closed form per cell, token for token — margins and counts are
    # exact bigints, the division is the only double op.
    "chi2_event_weekday": """
        WITH ev AS (
          SELECT event_type,
                 date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) % 7 AS wd
          FROM events
        ),
        cells AS (
          SELECT event_type, wd, cast(count(*) AS BIGINT) AS n
          FROM ev GROUP BY event_type, wd
        ),
        r AS (SELECT event_type, cast(count(*) AS BIGINT) AS r FROM ev GROUP BY event_type),
        c AS (SELECT wd, cast(count(*) AS BIGINT) AS c FROM ev GROUP BY wd),
        t AS (SELECT cast(count(*) AS BIGINT) AS tot FROM ev),
        grid AS (SELECT r.event_type, c.wd, r.r, c.c, t.tot FROM r, c, t),
        full_grid AS (
          SELECT g.event_type, cast(g.wd AS BIGINT) AS wd,
                 cast(coalesce(cells.n, 0) AS BIGINT) AS n, g.r, g.c, g.tot
          FROM grid g
          LEFT JOIN cells ON cells.event_type = g.event_type AND cells.wd = g.wd
        )
        SELECT event_type, wd, n,
               ((cast(tot AS DOUBLE) * cast(n AS DOUBLE)
                 - cast(r AS DOUBLE) * cast(c AS DOUBLE))
                * (cast(tot AS DOUBLE) * cast(n AS DOUBLE)
                   - cast(r AS DOUBLE) * cast(c AS DOUBLE)))
                 / (cast(tot AS DOUBLE) * cast(r AS DOUBLE) * cast(c AS DOUBLE))
                 AS chi2_contrib
        FROM full_grid
    """,
    "daily_counts_delta": """
        WITH daily AS (
          SELECT event_type,
                 cast(date_diff('day', DATE '2024-01-01', cast(ts AS DATE))
                      AS BIGINT) AS day,
                 cast(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, day, cnt,
               cast(cnt - lag(cnt) OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS delta
        FROM daily
    """,
    # Ground truth with no window at all: min(ts) over a tolerance-bounded
    # LEFT JOIN — an independent derivation of the forward as-of.
    "events_asof_forward": """
        WITH ev AS (
          SELECT event_id, user_id, event_type,
                 epoch_us(cast(ts AS TIMESTAMP)) AS t_us
          FROM events
        )
        SELECT s.event_id, s.user_id,
               cast(min(p.t_us) - s.t_us AS BIGINT) AS lag_us
        FROM ev s
        LEFT JOIN ev p
          ON p.user_id = s.user_id AND p.event_type = 'purchase'
         AND p.t_us > s.t_us AND p.t_us <= s.t_us + 3600000000
        WHERE s.event_type = 'signup'
        GROUP BY s.event_id, s.user_id, s.t_us
    """,
    "bitmask_profiles": """
        WITH bits AS (
          SELECT user_id,
                 date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) AS day,
                 (CAST(1 AS BIGINT) << (ascii(substring(event_type, 1, 1)) % 16))
                   AS bit
          FROM events
        ),
        masks AS (
          SELECT user_id, day, cast(bit_or(bit) AS BIGINT) AS mask
          FROM bits GROUP BY user_id, day
        )
        SELECT mask, cast(count(*) AS BIGINT) AS n_user_days
        FROM masks GROUP BY mask
    """,
}
