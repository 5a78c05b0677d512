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
