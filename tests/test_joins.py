"""asof_join / interval_join / interval_count unit tests.

Fixtures are tiny hand-computable frames; the cross-engine oracle runs in
test_oracle_parity.py via the events_asof_attrib / events_window_counts
queries (DuckDB ASOF JOIN / BETWEEN-join oracles).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_custom_transforms_spark.operators.joins import (
    asof_join,
    interval_count,
    interval_join,
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, px) — the "right" side
    return spark.createDataFrame(
        [
            ("a", _ts(0), 100.0),
            ("a", _ts(10), 110.0),
            ("a", _ts(20), 120.0),
            ("b", _ts(5), 55.0),
        ],
        "sym string, ts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    # (key, ts, qty) — the "left" side
    return spark.createDataFrame(
        [
            ("a", _ts(0), 1),    # exact match -> px 100
            ("a", _ts(15), 2),   # between -> px 110
            ("a", _ts(99), 3),   # after all -> px 120
            ("b", _ts(4), 4),    # before any b quote -> null
            ("c", _ts(7), 5),    # key never quoted -> null
        ],
        "sym string, ts timestamp, qty int",
    )


def test_asof_backward_basic(trades, quotes):
    out = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="ts")
    rows = {(r.sym, r.qty): (r.px, r.ts_r) for r in out.collect()}
    assert rows[("a", 1)] == (100.0, _ts(0))  # exact-ts right row IS eligible
    assert rows[("a", 2)] == (110.0, _ts(10))
    assert rows[("a", 3)] == (120.0, _ts(20))
    assert rows[("b", 4)] == (None, None)
    assert rows[("c", 5)] == (None, None)
    assert out.count() == 5  # left-join semantics: no left row lost


def test_asof_forward(trades, quotes):
    out = asof_join(trades, quotes, on="sym", direction="forward")
    rows = {(r.sym, r.qty): r.px for r in out.collect()}
    assert rows[("a", 1)] == 100.0   # exact match still eligible forward
    assert rows[("a", 2)] == 120.0   # next quote at t=20
    assert rows[("a", 3)] is None    # nothing after t=99
    assert rows[("b", 4)] == 55.0


def test_asof_tolerance(trades, quotes):
    out = asof_join(trades, quotes, on="sym", tolerance_us=5_000_000)
    rows = {(r.sym, r.qty): r.px for r in out.collect()}
    assert rows[("a", 1)] == 100.0   # gap 0 <= 5s
    assert rows[("a", 2)] == 110.0   # gap 5s <= 5s (inclusive)
    assert rows[("a", 3)] is None    # gap 79s > 5s -> nulled


def test_asof_payload_atomicity(spark):
    """A null in one right payload column must NOT be backfilled from an
    older right row — the whole payload comes from one row."""
    left = spark.createDataFrame([("a", _ts(30), 1)], "k string, ts timestamp, n int")
    right = spark.createDataFrame(
        [("a", _ts(10), 7.0, "old"), ("a", _ts(20), None, "new")],
        "k string, ts timestamp, x double, tag string",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row.tag == "new" and row.x is None


def test_asof_single_shuffle_no_join(trades, quotes):
    plan = asof_join(trades, quotes, on="sym")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_interval_join_equi_key(spark):
    left = spark.createDataFrame(
        [("a", _ts(100)), ("b", _ts(100))], "k string, lts timestamp"
    )
    right = spark.createDataFrame(
        [("a", _ts(95)), ("a", _ts(150)), ("b", _ts(100))],
        "k string, rts timestamp",
    )
    out = interval_join(
        left.alias("l"), right.alias("r"), "lts", "rts",
        lo_us=-10_000_000, hi_us=0, on="k",
    )
    got = {(r["k"], r.rts) for r in out.select(left["k"], "rts").collect()}
    assert got == {("a", _ts(95)), ("b", _ts(100))}


def test_interval_join_bucketized_matches_naive(spark):
    import random

    rnd = random.Random(7)
    lrows = [(i, _ts(rnd.randrange(0, 500))) for i in range(40)]
    rrows = [(j, _ts(rnd.randrange(0, 500))) for j in range(60)]
    left = spark.createDataFrame(lrows, "lid int, lts timestamp")
    right = spark.createDataFrame(rrows, "rid int, rts timestamp")
    lo, hi = -30_000_000, 15_000_000

    out = interval_join(left, right, "lts", "rts", lo_us=lo, hi_us=hi)
    got = {(r.lid, r.rid) for r in out.collect()}

    naive = {
        (lid, rid)
        for lid, lts in lrows
        for rid, rts in rrows
        if lo <= (rts - lts) / dt.timedelta(microseconds=1) <= hi
    }
    assert got == naive
    # bucketization must not duplicate pairs (each right row lives in 1 bucket)
    assert out.count() == len(got)


def test_interval_count_keeps_zero_rows(spark):
    left = spark.createDataFrame(
        [(1, _ts(100)), (2, _ts(400))], "lid int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(95)), (11, _ts(99)), (12, _ts(300))], "rid int, rts timestamp"
    )
    out = interval_count(left, right, "lts", "rts", lo_us=-10_000_000, hi_us=0)
    got = {r.lid: r.n_in_range for r in out.collect()}
    assert got == {1: 2, 2: 0}  # left row 2 survives with count 0


def test_interval_join_rejects_bad_grain(spark):
    left = spark.createDataFrame([(1, _ts(0))], "lid int, lts timestamp")
    with pytest.raises(ValueError, match="grain"):
        interval_join(left, left, "lts", "lts", lo_us=0, hi_us=10_000_000, grain_us=1)
    with pytest.raises(ValueError, match="hi_us"):
        interval_count(left, left, "lts", "lts", lo_us=5, hi_us=0)


def test_interval_count_duplicate_left_rows(spark):
    """Two IDENTICAL left rows must yield two output rows with their own
    counts — not one row with a doubled count (round-2 advisor finding:
    value-grouping collapsed duplicates and broke the 'left rows are never
    lost' contract)."""
    left = spark.createDataFrame(
        [(1, _ts(100)), (1, _ts(100)), (2, _ts(400))], "lid int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(95)), (11, _ts(99))], "rid int, rts timestamp"
    )
    out = interval_count(left, right, "lts", "rts", lo_us=-10_000_000, hi_us=0)
    rows = sorted((r.lid, r.n_in_range) for r in out.collect())
    assert rows == [(1, 2), (1, 2), (2, 0)]


def test_interval_same_ts_names(spark):
    """The natural case where BOTH inputs call their timestamp 'ts' must not
    raise AMBIGUOUS_REFERENCE (round-2 advisor finding: unqualified F.col
    in the range predicate) — for the bucketized path, the equi-key path,
    and interval_count."""
    left = spark.createDataFrame([(1, _ts(100)), (2, _ts(300))], "lid int, ts timestamp")
    right = spark.createDataFrame([(10, _ts(95)), (11, _ts(299))], "rid int, ts timestamp")
    out = interval_join(left, right, "ts", "ts", lo_us=-10_000_000, hi_us=0)
    assert sorted((r.lid, r.rid) for r in out.collect()) == [(1, 10), (2, 11)]
    lk = left.withColumn("k", F.lit("x"))
    rk = right.withColumn("k", F.lit("x"))
    outk = interval_join(lk, rk, "ts", "ts", lo_us=-10_000_000, hi_us=0, on="k")
    assert sorted((r.lid, r.rid) for r in outk.collect()) == [(1, 10), (2, 11)]
    cnt = interval_count(left, right, "ts", "ts", lo_us=-10_000_000, hi_us=0)
    assert sorted((r.lid, r.n_in_range) for r in cnt.collect()) == [(1, 1), (2, 1)]


def test_interval_hot_bucket_bounded_fanout(spark):
    """Planted burst: 500 right rows in ONE time bucket. The bucketized plan
    must stay an equi-join (hot buckets are ordinary equi-join skew, handed
    to AQE), produce the exact answer, and its pre-filter join volume must
    equal bucket co-residency — only left windows covering the burst bucket
    touch the burst, far-away left rows join nothing."""
    from kafka_custom_transforms_spark.operators.joins import _bucketize
    from kafka_custom_transforms_spark.plans.explain import plan_str

    base = 500_000  # seconds; grain = 60 s buckets
    rrows = [(j, _ts(base)) for j in range(500)]  # one bucket, all same ts
    near = [(i, _ts(base + 30)) for i in range(5)]  # window covers the burst
    far = [(100 + i, _ts(base + 7200 + 120 * i)) for i in range(20)]  # empty buckets
    left = spark.createDataFrame(near + far, "lid int, lts timestamp")
    right = spark.createDataFrame(rrows, "rid int, rts timestamp")
    lo, hi = -60_000_000, 0

    out = interval_join(left, right, "lts", "rts", lo_us=lo, hi_us=hi)
    assert out.count() == 5 * 500  # exact: every near row matches the burst
    plan = plan_str(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # Pre-filter fan-out (the internal bucket equi-join's volume): replicate
    # the bucketization and count joined rows — bounded by co-residency.
    grain = hi - lo
    l_us = F.unix_micros(F.col("lts"))
    exploded = left.withColumn(
        "b", F.explode(F.sequence(F.floor((l_us + lo) / grain), F.floor((l_us + hi) / grain)))
    )
    r_b = right.withColumn("b", _bucketize("rts", grain))
    fanout = exploded.join(r_b, "b", "inner").count()
    # near rows' 2 covered buckets include the burst bucket once each; far
    # rows cover only empty buckets -> fan-out == the exact match volume.
    assert fanout == 5 * 500


def test_interval_count_keeps_null_ts_left_rows(spark):
    """A left row with a NULL timestamp must survive with count 0 (the
    'left rows are never lost' contract) — plain explode would drop it."""
    from kafka_custom_transforms_spark.operators.joins import interval_count

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30"), (2, None)], "id long, ts string"
    ).selectExpr("id", "cast(ts as timestamp) as ts")
    right = spark.createDataFrame(
        [("2024-01-01 00:00:10",)], "ts string"
    ).selectExpr("cast(ts as timestamp) as ts")
    out = {
        r["id"]: r["n_in_range"]
        for r in interval_count(left, right, "ts", "ts", -60_000_000, 0).collect()
    }
    assert out == {1: 1, 2: 0}
