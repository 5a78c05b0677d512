"""Pre-staged registry candidates for round 14 — implemented and
oracle-tested now, NOT yet registered (the correctness-window rotation
budget is <=4 new rows per round, SURVEY §10.5; rounds 13 and 14 each
lift one staged module, same playbook as the r12 lift).

Each entry mirrors the registry contract exactly: a ``(spark, sf_dir) ->
DataFrame`` callable plus a DuckDB oracle SQL string with matching column
names. ``tests/test_staging_r14.py`` runs the driver-gate
normalize-and-compare at sf0.001; verify once at sf0.01 before lifting.

Staged rows (all surfaces absent from the current 199 + the staged r13
four):
  - ts_pattern_similarity — time-series shape matching (the PAPERS.md
    streaming-similarity theme): per-user hour-of-day activity profiles
    scored against a fixed diurnal pattern with an INTEGER similarity
    (dot^2 scaled by the norm product — monotone in cosine, no sqrt, no
    floats), deterministic top-k.  One shuffle on user_id; the 24-bin
    profile is a conditional-sum expression, not a pivot/collect.
  - variant_explode_props — the VARIANT table-valued surface: LATERAL
    ``variant_explode`` over array-shaped payloads (the TVF complement of
    variant_events' path extraction).  Oracle reconstructs positions and
    values from the base columns — ground truth, no JSON parser.
  - try_arithmetic_orders — the ANSI-safe ``try_*`` family: try_divide
    (NULL on the planted zero divisors), try_multiply (NULL past the
    exact int64 overflow boundary), try_to_number (NULL on planted
    garbage).  The oracle models every NULL site with explicit CASE
    arithmetic — each try_* result is checked, not trusted.
  - setops_all_lineitems — multiset set operations (EXCEPT ALL /
    INTERSECT ALL): count-preserving bag semantics the distinct-flavor
    setops_users row cannot express; both engines implement the SQL
    standard forms directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table

# Diurnal query pattern: quiet night, ramping morning, busy afternoon,
# easing evening. Integer weights so every similarity term is exact.
TS_PATTERN = [1] * 6 + [2] * 6 + [4] * 6 + [3] * 6
_P_NORM2 = sum(p * p for p in TS_PATTERN)  # 180


def ts_pattern_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users whose hour-of-day activity profile best matches the
    fixed diurnal pattern.  Profile = 24 conditional counts (one grouped
    pass, no pivot); similarity = dot(profile, pattern)^2 * 1000 //
    (|profile|^2 * |pattern|^2) — integer, exact, monotone in cosine^2,
    so the ranking equals the cosine ranking without any float or sqrt.
    Ties break on user_id; magnitudes stay far inside int64 (counts ~1e3
    per cell at sf1 -> dot^2*1000 ~ 1e16).  Scale shape: one shuffle on
    (user_id), then a driver-bounded top-k (TakeOrderedAndProject)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.hour("ts").alias("h")
    )
    cells = [
        F.sum(F.when(F.col("h") == hh, 1).otherwise(0)).alias(f"c{hh}")
        for hh in range(24)
    ]
    prof = ev.groupBy("user_id").agg(*cells)
    dot_sql = " + ".join(f"c{hh} * {TS_PATTERN[hh]}" for hh in range(24))
    n2_sql = " + ".join(f"c{hh} * c{hh}" for hh in range(24))
    # SQL `div`: exact int64 division (both engines floor positives the
    # same way); the whole similarity stays integer end to end
    sim = F.expr(
        f"(({dot_sql}) * ({dot_sql}) * 1000) div (({n2_sql}) * {_P_NORM2})"
    )
    return (
        prof.select(
            "user_id",
            sim.cast("long").alias("sim_milli"),
            F.expr(n2_sql).cast("long").alias("profile_norm2"),
        )
        .orderBy(F.col("sim_milli").desc(), F.col("user_id"))
        .limit(20)
    )


def variant_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL ``variant_explode`` over the array-shaped VARIANT payloads
    (event_id % 3 == 2 -> {"arr": [k, k+1]}): each array element becomes a
    (pos, value) row.  Pure per-row TVF expansion — zero extra shuffles
    before the final aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    arr = ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == 2).select(
        "event_type",
        F.parse_json(
            F.concat(F.lit('{"arr": ['), k, F.lit(", "), k + 1, F.lit("]}"))
        ).alias("v"),
    )
    arr.createOrReplaceTempView("kcts_var_arr")
    return spark.sql(
        """
        SELECT event_type,
               cast(count(*) AS bigint)            AS n_elems,
               cast(sum(e.pos) AS bigint)          AS sum_pos,
               cast(sum(cast(e.value AS bigint)) AS bigint) AS sum_vals
        FROM kcts_var_arr,
             LATERAL variant_explode(variant_get(v, '$.arr')) AS e
        GROUP BY event_type
        """
    )


def try_arithmetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: ANSI mode is ON repo-wide (overflow and bad
    casts THROW), and the ``try_*`` family is the per-expression escape
    hatch — NULL on failure instead of a job abort.  Three planted
    failure sites: zero divisors (o_orderkey % 7 == 0), int64 overflow
    (o_orderkey * 10^15 overflows exactly when o_orderkey > 9223), and
    unparseable numerics (every 5th key).  Every NULL site is modeled
    exactly in the oracle; floor(try_divide) is cross-engine-stable
    because both engines IEEE-divide the same exact-in-double operands.
    Pure codegen projections + one grouped aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    div = F.expr("try_divide(cents, o_orderkey % 7)")
    mul = F.expr("try_multiply(o_orderkey, 1000000000000000)")  # 10^15
    num = F.expr(
        "try_to_number(CASE WHEN o_orderkey % 5 = 0 THEN 'x' "
        "ELSE cast(o_orderkey % 1000 AS string) END, '999')"
    )
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(div.isNull(), 1).otherwise(0)).cast("long").alias("n_div_null"),
        F.sum(F.floor(div)).cast("long").alias("sum_div_floor"),
        F.sum(F.when(mul.isNull(), 1).otherwise(0)).cast("long").alias("n_mul_null"),
        F.sum(F.when(num.isNull(), 1).otherwise(0)).cast("long").alias("n_num_null"),
        F.sum(num.cast("long")).cast("long").alias("sum_num"),
    )


def setops_all_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations: supplier keys of returned ('R') lineitems
    EXCEPT ALL / INTERSECT ALL those of accepted ('A') ones — bag
    semantics where every duplicate counts (max(a-b,0) and min(a,b) per
    key), which the distinct-flavor setops row cannot express.  Both
    operators plan as aggregate+join under the hood: one shuffle per
    side on the value, never a sort."""
    li = load_table(spark, sf_dir, "lineitem")
    li.select("l_returnflag", "l_suppkey").createOrReplaceTempView("kcts_li_bags")
    return spark.sql(
        """
        WITH r AS (SELECT l_suppkey FROM kcts_li_bags WHERE l_returnflag = 'R'),
             a AS (SELECT l_suppkey FROM kcts_li_bags WHERE l_returnflag = 'A'),
             ex AS (SELECT * FROM r EXCEPT ALL SELECT * FROM a),
             ia AS (SELECT * FROM r INTERSECT ALL SELECT * FROM a)
        SELECT (SELECT cast(count(*) AS bigint) FROM ex) AS n_except_all,
               (SELECT cast(count(*) AS bigint) FROM ia) AS n_intersect_all,
               (SELECT cast(count(DISTINCT l_suppkey) AS bigint) FROM ex)
                 AS n_except_keys
        """
    )


STAGED = {
    "ts_pattern_similarity": ts_pattern_similarity,
    "variant_explode_props": variant_explode_props,
    "try_arithmetic_orders": try_arithmetic_orders,
    "setops_all_lineitems": setops_all_lineitems,
}

_TS_CELLS = ",\n                 ".join(
    f"sum(CASE WHEN hour(ts) = {hh} THEN 1 ELSE 0 END) AS c{hh}"
    for hh in range(24)
)
_TS_DOT = " + ".join(f"c{hh} * {TS_PATTERN[hh]}" for hh in range(24))
_TS_N2 = " + ".join(f"c{hh} * c{hh}" for hh in range(24))

STAGED_ORACLES = {
    "ts_pattern_similarity": f"""
        WITH prof AS (
          SELECT user_id,
                 {_TS_CELLS}
          FROM events GROUP BY user_id
        )
        SELECT user_id,
               cast(({_TS_DOT}) * ({_TS_DOT}) * 1000
                    // (({_TS_N2}) * {_P_NORM2}) AS bigint) AS sim_milli,
               cast({_TS_N2} AS bigint) AS profile_norm2
        FROM prof
        ORDER BY sim_milli DESC, user_id
        LIMIT 20
    """,
    # Ground truth from the base columns: each arr-shaped event contributes
    # positions 0+1 and values k + (k+1).
    "variant_explode_props": """
        SELECT event_type,
               cast(2 * count(*) AS bigint) AS n_elems,
               cast(count(*) AS bigint) AS sum_pos,
               cast(sum(2 * cast(props->>'$.k' AS bigint) + 1) AS bigint)
                 AS sum_vals
        FROM events
        WHERE event_id % 3 = 2
        GROUP BY event_type
    """,
    "try_arithmetic_orders": """
        WITH o AS (
          SELECT o_orderstatus, o_orderkey,
                 cast(round(o_totalprice * 100) AS bigint) AS cents
          FROM orders
        )
        SELECT o_orderstatus,
               cast(count(*) AS bigint) AS n,
               cast(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
                    AS bigint) AS n_div_null,
               cast(sum(CASE WHEN o_orderkey % 7 = 0 THEN NULL
                             ELSE floor(cents / (o_orderkey % 7)) END)
                    AS bigint) AS sum_div_floor,
               cast(sum(CASE WHEN o_orderkey > 9223 THEN 1 ELSE 0 END)
                    AS bigint) AS n_mul_null,
               cast(sum(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END)
                    AS bigint) AS n_num_null,
               cast(sum(CASE WHEN o_orderkey % 5 = 0 THEN NULL
                             ELSE o_orderkey % 1000 END) AS bigint) AS sum_num
        FROM o GROUP BY o_orderstatus
    """,
    "setops_all_lineitems": """
        WITH r AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
             a AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'),
             ex AS (SELECT * FROM r EXCEPT ALL SELECT * FROM a),
             ia AS (SELECT * FROM r INTERSECT ALL SELECT * FROM a)
        SELECT (SELECT cast(count(*) AS bigint) FROM ex) AS n_except_all,
               (SELECT cast(count(*) AS bigint) FROM ia) AS n_intersect_all,
               (SELECT cast(count(DISTINCT l_suppkey) AS bigint) FROM ex)
                 AS n_except_keys
    """,
}
