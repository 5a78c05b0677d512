"""Pre-staged registry candidates for round 13 — implemented and
oracle-tested now, NOT yet registered in ``__spark_entry__.py`` (the
correctness-window rotation budget is <=4 new rows per round, SURVEY
§10.5; round 12's budget went to the recursive-CTE/approx-top-k/order-
stats/phrase-index group). Round 13's first registry commit can lift
these verbatim — same playbook as the r12 lift.

Each entry mirrors the registry contract exactly: a ``(spark, sf_dir) ->
DataFrame`` callable plus a DuckDB oracle SQL string with matching column
names. ``tests/test_staging_r13.py`` runs the same normalize-and-compare
as ``tests/test_oracle_parity.py`` at sf0.001; verify once at the
driver's gate scale (sf0.01) before lifting.

Staged rows (all surfaces absent from the current 199):
  - percentile_cont_lineitem — interpolated quantiles
    (``percentile_cont WITHIN GROUP``), the continuous complement of
    r12's percentile_disc row.  Exact cross-engine because l_quantity is
    integer-valued and the interpolation fractions are quarters: every
    intermediate double is exactly representable.  The oracle derives the
    SQL-standard convention (pos = q*(n-1), linear interpolation between
    the neighbouring order statistics) explicitly with a window, the same
    derive-don't-trust approach as order_stats_lineitem.
  - ols_quantity_price — exact distributed least squares: slope/intercept
    of extendedprice ~ quantity per return flag, from INTEGER-scaled
    partial sums (cents x milli-units fit bigint far past sf1), combined
    into doubles only at the final closed form.  Sums are
    order-independent, so the result is bit-stable across partitionings
    AND engines — the repo's integer-milli pattern applied to regression.
  - url_parse_events — Spark's parse_url (HOST / PATH / QUERY key) over
    deterministically synthesized URLs, aggregated with two more new
    SQL surfaces: GROUP BY ALL and count_if.  The oracle reconstructs
    host/path/param from the same base columns directly — ground truth,
    not a parallel parser.
  - str_to_map_props — map-function surface: str_to_map on a derived
    k=v CSV, element_at / map_contains_key / map_filter + size.  The
    oracle recomputes every value from the base columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table


def percentile_cont_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous (interpolated) quantiles of l_quantity per return flag.
    percentile_cont's convention is pos = q*(n-1) with linear
    interpolation; q in {.25,.5,.75} makes every fraction a quarter, and
    l_quantity is integer-valued 1..50, so lo + (hi-lo)*frac is EXACT in
    binary — cross-engine equality is bitwise, not approximate.  One
    shuffle on the group key; the within-group sort is per-group local."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("kcts_li_cont")
    return spark.sql(
        """
        SELECT l_returnflag,
               percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS c25_qty,
               percentile_cont(0.50) WITHIN GROUP (ORDER BY l_quantity) AS c50_qty,
               percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS c75_qty
        FROM kcts_li_cont
        GROUP BY l_returnflag
        """
    )


def ols_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed ordinary least squares of l_extendedprice on
    l_quantity per return flag.  The five sufficient statistics (n, Sx,
    Sy, Sxy, Sxx) are summed as BIGINTs over integer-scaled columns
    (quantity in milli-units, price in cents: per-row products max ~5e10,
    sums fit int64 past sf1), so the aggregation is order-independent and
    partitioning-invariant; slope and intercept come from ONE closed-form
    double evaluation at the end — the same int64->double conversions and
    IEEE ops in any engine.  This is regression at 100 TB shape: one
    partial/final aggregate pair, constant state per group, no second
    pass."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_quantity") * 1000).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c).cast("double") for c in ("n", "sx", "sy", "sxy", "sxx"))
    # slope in (cents per milli-unit); rescale x1000/100 -> price units per
    # quantity unit. Single double expression — deterministic everywhere.
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx) * F.lit(10.0)
    # intercept = mean_y - slope * mean_x in PRICE/QUANTITY units: sy is in
    # cents (/100), sx in milli-units (/1000). The original staging draft
    # divided the slope term by 100000 — off by 100x — and the oracle
    # mirrored the same expression, so parity was structurally blind to it;
    # caught by the r12 self-review against DuckDB's regr_intercept
    # (52906.76 vs 51847.11 on sf0.001 flag 'A'), now pinned by
    # tests/test_staging_r13.py::test_ols_matches_duckdb_regr_builtins.
    intercept = (sy / F.lit(100.0) - slope * sx / F.lit(1000.0)) / n
    return s.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def url_parse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url over deterministically synthesized URLs — the string/web
    extraction surface — aggregated with GROUP BY ALL and count_if (both
    new-in-Spark-4 SQL conveniences DuckDB shares).  The oracle does NOT
    re-parse: it reconstructs host/path/param from the same base columns,
    so Spark's parser is checked against ground truth.  Pure per-row
    expressions + one aggregate: zero extra shuffles."""
    ev = load_table(spark, sf_dir, "events")
    ev.select(
        "event_id",
        "event_type",
        "user_id",
        F.concat(
            F.lit("https://ev-"),
            F.col("event_type"),
            F.lit(".example.com/u/"),
            F.col("user_id").cast("string"),
            F.lit("/p?k="),
            F.get_json_object(F.col("props"), "$.k"),
            F.lit("&src=kcts"),
        ).alias("url"),
    ).createOrReplaceTempView("kcts_urls")
    return spark.sql(
        """
        SELECT parse_url(url, 'HOST') AS host,
               count(*) AS n,
               count_if(parse_url(url, 'QUERY', 'k') >= '50') AS n_high_k,
               min(parse_url(url, 'PATH')) AS min_path
        FROM kcts_urls
        GROUP BY ALL
        """
    )


def str_to_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function surface: build a k=v CSV per event, parse it with
    str_to_map, and consume the map with element_at, map_contains_key,
    and map_filter — per-row codegen expressions, then one aggregate.
    The oracle recomputes every value from the base columns (the map is
    derived, so ground truth needs no map type in DuckDB)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    csv = F.concat(
        F.lit("k="),
        k.cast("string"),
        F.lit(",uid="),
        F.col("user_id").cast("string"),
        F.lit(",type="),
        F.col("event_type"),
    )
    m = F.expr("str_to_map(csv, ',', '=')")
    return (
        ev.select("event_type", "user_id", k.alias("k"), csv.alias("csv"))
        .select(
            "event_type",
            m.getItem("k").cast("long").alias("k_back"),
            F.size(m).alias("m_size"),
            F.expr("map_contains_key(str_to_map(csv, ',', '=') , 'uid')").alias("has_uid"),
            F.size(
                F.expr(
                    "map_filter(str_to_map(csv, ',', '='), "
                    "(mk, mv) -> try_cast(mv AS BIGINT) % 2 = 0)"
                )
            ).alias("n_even_vals"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k_back").cast("long").alias("sum_k"),
            F.sum(F.col("m_size").cast("long")).alias("sum_sizes"),
            F.sum(F.when(F.col("has_uid"), 1).otherwise(0)).cast("long").alias("n_has_uid"),
            F.sum(F.col("n_even_vals").cast("long")).alias("sum_even_vals"),
        )
    )


STAGED = {
    "percentile_cont_lineitem": percentile_cont_lineitem,
    "ols_quantity_price": ols_quantity_price,
    "url_parse_events": url_parse_events,
    "str_to_map_props": str_to_map_props,
}

STAGED_ORACLES = {
    # pos = q*(n-1), linear interpolation — the SQL-standard convention
    # derived explicitly (trust nothing about quantile_cont's indexing).
    "percentile_cont_lineitem": """
        WITH ranked AS (
          SELECT l_returnflag, l_quantity,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_quantity) - 1 AS rn,
                 count(*) OVER (PARTITION BY l_returnflag) AS n
          FROM lineitem
        ),
        pieces AS (
          SELECT l_returnflag, q,
                 min(CASE WHEN rn = cast(floor(q * (n - 1)) AS BIGINT)
                          THEN l_quantity END) AS lo,
                 min(CASE WHEN rn = cast(ceil(q * (n - 1)) AS BIGINT)
                          THEN l_quantity END) AS hi,
                 min(q * (n - 1) - floor(q * (n - 1))) AS frac
          FROM ranked, (SELECT unnest([0.25, 0.50, 0.75]) AS q)
          GROUP BY l_returnflag, q
        )
        SELECT l_returnflag,
               min(CASE WHEN q = 0.25 THEN lo + (hi - lo) * frac END) AS c25_qty,
               min(CASE WHEN q = 0.50 THEN lo + (hi - lo) * frac END) AS c50_qty,
               min(CASE WHEN q = 0.75 THEN lo + (hi - lo) * frac END) AS c75_qty
        FROM pieces
        GROUP BY l_returnflag
    """,
    "ols_quantity_price": """
        WITH scaled AS (
          SELECT l_returnflag,
                 cast(l_quantity * 1000 AS BIGINT) AS x,
                 cast(round(l_extendedprice * 100) AS BIGINT) AS y
          FROM lineitem
        ),
        s AS (
          SELECT l_returnflag,
                 cast(count(*) AS BIGINT) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM scaled GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               (cast(n AS DOUBLE) * cast(sxy AS DOUBLE)
                  - cast(sx AS DOUBLE) * cast(sy AS DOUBLE))
               / (cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
                  - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)) * 10.0 AS slope,
               (cast(sy AS DOUBLE) / 100.0
                  - ((cast(n AS DOUBLE) * cast(sxy AS DOUBLE)
                        - cast(sx AS DOUBLE) * cast(sy AS DOUBLE))
                     / (cast(n AS DOUBLE) * cast(sxx AS DOUBLE)
                        - cast(sx AS DOUBLE) * cast(sx AS DOUBLE)) * 10.0)
                    * cast(sx AS DOUBLE) / 1000.0)
               / cast(n AS DOUBLE) AS intercept
        FROM s
    """,
    # Ground truth from the base columns — no URL parser on the oracle side.
    "url_parse_events": """
        SELECT 'ev-' || event_type || '.example.com' AS host,
               count(*) AS n,
               cast(sum(CASE WHEN (props->>'$.k') >= '50'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_high_k,
               min('/u/' || user_id || '/p') AS min_path
        FROM events
        GROUP BY 1
    """,
    "str_to_map_props": """
        SELECT event_type,
               cast(count(*) AS BIGINT) AS n,
               cast(sum(cast(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
               cast(count(*) * 3 AS BIGINT) AS sum_sizes,
               cast(count(*) AS BIGINT) AS n_has_uid,
               cast(sum(CASE WHEN cast(props->>'$.k' AS BIGINT) % 2 = 0
                             THEN 1 ELSE 0 END
                        + CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS sum_even_vals
        FROM events
        GROUP BY event_type
    """,
}
