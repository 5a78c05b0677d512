"""Oracle parity for the pre-staged round-16 registry candidates
(tools/staging_r16.py) — the same normalize-and-compare as
tests/test_oracle_parity.py, so lifting them into the registry in round
16 is a no-risk move (rounds 14/15 lift their own staged modules first,
same playbook as the r12/r13 lifts)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity_common import TABLES, normalize as _normalize  # noqa: E402
from staging_r16 import STAGED, STAGED_ORACLES  # noqa: E402

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
    # staging means staging: the <=4-rows/round budget is enforced by
    # keeping these OUT of the registry until the round-16 rotation
    # commit (and disjoint from any staging module still ahead in line;
    # already-lifted modules are deleted, so import defensively)
    assert not set(STAGED) & set(entry_mod.queries())
    for mod in ("staging_r15",):
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


def test_moments_match_convention_converted_builtins(spark, ddb):
    """Independent-implementation check for moments_lineitem: DuckDB's
    skewness()/kurtosis() builtins use the SAMPLE conventions
    (bias-corrected g1 -> G1, excess kurtosis with the n-1 correction);
    convert our population statistics to those conventions and require
    agreement to 1e-9 relative — two genuinely different computations
    (power sums vs the builtins' streaming central-moment updates) must
    meet (the r12 OLS lesson: don't let both sides share one path)."""
    from staging_r16 import moments_lineitem

    got = {
        r["l_returnflag"]: (r["n"], r["skew_qty"], r["kurt_qty"])
        for r in moments_lineitem(spark, SF_DIR).collect()
    }
    want = {
        flag: (skw, krt)
        for flag, skw, krt in ddb.execute(
            "SELECT l_returnflag, skewness(cast(l_quantity AS BIGINT)), "
            "kurtosis(cast(l_quantity AS BIGINT)) FROM lineitem "
            "GROUP BY l_returnflag"
        ).fetchall()
    }
    assert set(got) == set(want)
    for flag, (n, g1, excess) in got.items():
        # sample skewness G1 = g1 * sqrt(n(n-1)) / (n-2)
        G1 = g1 * math.sqrt(n * (n - 1)) / (n - 2)
        # sample excess kurtosis from population excess g2:
        # G2 = ((n+1)*g2 + 6) * (n-1) / ((n-2)(n-3))
        G2 = ((n + 1) * excess + 6.0) * (n - 1) / ((n - 2) * (n - 3))
        ws, wk = want[flag]
        assert G1 == pytest.approx(ws, rel=1e-9), flag
        assert G2 == pytest.approx(wk, rel=1e-9), flag


def test_bitmap_retention_matches_pure_python_model(spark):
    """Independent-implementation check for bitmap_retention: recompute
    adjacent-week retention with plain Python sets from the raw parquet
    — no bitmaps, no SQL joins — and require exact equality (pins the
    inclusion-exclusion identity itself, not just oracle parity)."""
    from collections import defaultdict

    from staging_r16 import bitmap_retention

    rows = duckdb.execute(
        "select user_id, "
        "date_diff('day', DATE '2024-01-01', cast(ts as date)) // 7 as w "
        f"from '{SF_DIR}/events.parquet'"
    ).fetchall()
    weeks = defaultdict(set)
    for uid, w in rows:
        weeks[w].add(uid)
    want = {
        w: (len(weeks[w]), len(weeks[w] & weeks[w + 1]))
        for w in sorted(weeks)
        if w + 1 in weeks
    }
    got = {
        r["week_idx"]: (r["active_users"], r["retained_users"])
        for r in bitmap_retention(spark, SF_DIR).collect()
    }
    assert got == want


def test_event_transitions_conserve_row_count(spark, ddb):
    """Every event except each user's last produces exactly one
    transition: sum(n_trans) == n_events - n_users (a structural
    invariant independent of the oracle's window)."""
    from staging_r16 import event_transitions

    total = sum(
        r["n_trans"] for r in event_transitions(spark, SF_DIR).collect()
    )
    n_events, n_users = ddb.execute(
        "select count(*), count(distinct user_id) from events"
    ).fetchone()
    assert total == n_events - n_users
