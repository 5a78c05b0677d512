"""Oracle parity for the pre-staged round-19 registry candidates
(tools/staging_r19.py) — the same normalize-and-compare as
tests/test_oracle_parity.py, so lifting them into the registry in round
19 is a no-risk move (rounds 14-18 lift their own staged modules first,
same playbook as the r12/r13 lifts)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity_common import TABLES, normalize as _normalize  # noqa: E402
from staging_r19 import STAGED, STAGED_ORACLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_staged_rows_have_oracles_and_are_not_registered():
    import __spark_entry__ as entry_mod

    assert set(STAGED) == set(STAGED_ORACLES)
    assert not set(STAGED) & set(entry_mod.queries())
    for mod in ("staging_r15", "staging_r16", "staging_r17",
                "staging_r18"):
        try:
            staged = __import__(mod).STAGED
        except ImportError:
            continue  # lifted into the registry and deleted
        assert not set(STAGED) & set(staged), mod


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, ddb, name):
    sdf = STAGED[name](spark, SF_DIR).toPandas()
    odf = ddb.execute(STAGED_ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf) and len(sdf) > 0
    pd.testing.assert_frame_equal(_normalize(sdf), _normalize(odf))


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_plan_hygiene(spark, name):
    """The registry-wide cartesian/BNLJ guard (tests/test_plans.py) only
    sweeps REGISTERED rows — pin the same hygiene here so the eventual
    lift cannot surprise it."""
    from kafka_custom_transforms_spark.plans.explain import plan_str

    p = plan_str(STAGED[name](spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def _user_day_rows():
    return duckdb.execute(
        "select distinct user_id, "
        "date_diff('day', DATE '2024-01-01', cast(ts as date)) as day "
        f"from '{SF_DIR}/events.parquet'"
    ).fetchall()


def test_cumulative_users_matches_pure_python(spark):
    from collections import defaultdict

    from staging_r19 import events_cumulative_users

    first = {}
    days = set()
    for uid, d in _user_day_rows():
        days.add(d)
        first[uid] = min(first.get(uid, d), d)
    new = defaultdict(int)
    for d0 in first.values():
        new[d0] += 1
    cum, want = 0, {}
    for d in sorted(days):
        cum += new[d]
        want[d] = (new[d], cum)
    got = {
        r["day"]: (r["n_new"], r["cum_users"])
        for r in events_cumulative_users(spark, SF_DIR).collect()
    }
    assert got == want
    # the final cumulative must equal the total distinct-user count
    assert max(got.values())[1] == len(first)


def test_cohort_retention_matches_pure_python_sets(spark):
    from collections import defaultdict

    from staging_r19 import cohort_retention_d1_d7

    by_user = defaultdict(set)
    for uid, d in _user_day_rows():
        by_user[uid].add(d)
    cohorts = defaultdict(lambda: [0, 0, 0])
    for uid, ds in by_user.items():
        d0 = min(ds)
        cohorts[d0][0] += 1
        cohorts[d0][1] += (d0 + 1) in ds
        cohorts[d0][2] += (d0 + 7) in ds
    got = {
        r["d0"]: [r["n_users"], r["retained_d1"], r["retained_d7"]]
        for r in cohort_retention_d1_d7(spark, SF_DIR).collect()
    }
    assert got == {k: list(v) for k, v in cohorts.items()}


def test_order_extremes_matches_pure_python_sort(spark):
    from collections import defaultdict

    from staging_r19 import order_extremes

    rows = duckdb.execute(
        "select o_orderpriority, o_orderkey, "
        "cast(round(o_totalprice*100) as bigint) "
        f"from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    for p, k, c in rows:
        groups[p].append((c, k))
    want = {}
    for p, vals in groups.items():
        vals.sort()
        want[p] = (vals[-1][1], vals[0][1], vals[-1][0], vals[0][0], len(vals))
    got = {
        r["prio"]: (
            r["top_order"],
            r["bottom_order"],
            r["max_cents"],
            r["min_cents"],
            r["n"],
        )
        for r in order_extremes(spark, SF_DIR).collect()
    }
    assert got == want


def test_rfm_segments_conserve_customers(spark, ddb):
    """Structural invariants: segment digits are 1..4 each, customer
    counts sum to the customer-with-orders total, and cents conserve."""
    from staging_r19 import rfm_segments

    rows = rfm_segments(spark, SF_DIR).collect()
    n_cust, total_cents = ddb.execute(
        "select count(distinct o_custkey), "
        "sum(cast(round(o_totalprice*100) as bigint)) from orders"
    ).fetchone()
    assert sum(r["n_cust"] for r in rows) == n_cust
    assert sum(r["sum_cents"] for r in rows) == total_cents
    for r in rows:
        s = r["segment"]
        assert 111 <= s <= 444
        assert all(1 <= int(d) <= 4 for d in str(s))


def test_ntile4_formula_matches_sql_ntile_exactly():
    """The distributive quartile formula (_ntile4_from_rank) must equal
    SQL ntile(4) for EVERY (n, rank) — the bit-for-bit contract that lets
    rfm_segments replace the one-task windows with global_ordinal ranks.
    Pure-Python sweep of every n in 1..500 against the standard fill rule
    (first n%4 buckets take ceil(n/4) rows) plus a Hypothesis pass at
    larger n."""
    from hypothesis import given, settings, strategies as st

    def sql_ntile4(rn, n):
        base, rem = divmod(n, 4)
        big = rem * (base + 1)
        if base == 0:
            return rn
        if rn <= big:
            return (rn - 1) // (base + 1) + 1
        return rem + (rn - big - 1) // base + 1

    def model(n):
        # definitional: deal n rows into 4 buckets, first n%4 get the
        # extra row; bucket of rank rn = index of the bucket holding it
        base, rem = divmod(n, 4)
        sizes = [base + 1 if b < rem else base for b in range(4)]
        out = []
        for b, sz in enumerate(sizes, start=1):
            out.extend([b] * sz)
        return out

    for n in range(1, 501):
        want = model(n)
        got = [sql_ntile4(rn, n) for rn in range(1, n + 1)]
        assert got == want, n

    @settings(max_examples=200, deadline=None)
    @given(n=st.integers(min_value=1, max_value=10**9),
           rn_frac=st.floats(min_value=0.0, max_value=1.0))
    def prop(n, rn_frac):
        rn = max(1, min(n, int(rn_frac * n) + 1))
        base, rem = divmod(n, 4)
        b = sql_ntile4(rn, n)
        assert 1 <= b <= 4
        # bucket boundaries: ranks strictly inside a bucket map to it
        sizes = [base + 1 if x < rem else base for x in range(4)]
        start = 1 + sum(sizes[: b - 1])
        assert start <= rn <= start + sizes[b - 1] - 1

    prop()


def test_ntile4_python_mirror_matches_spark_expression(spark):
    """The Python reference above and the staged Spark expression
    (_ntile4_from_rank) must agree on a boundary-heavy frame: every rank
    for several n spanning remainder classes 0..3."""
    from pyspark.sql import functions as F

    from staging_r19 import _ntile4_from_rank

    for n in (1, 2, 3, 4, 5, 7, 8, 97, 100):
        df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
        got = [
            r["b"]
            for r in df.select(_ntile4_from_rank(F.col("rn"), n).alias("b"))
            .orderBy("rn")
            .collect()
        ]
        base, rem = divmod(n, 4)
        sizes = [base + 1 if x < rem else base for x in range(4)]
        want = [b for b, sz in enumerate(sizes, start=1) for _ in range(sz)]
        assert got == want, n
