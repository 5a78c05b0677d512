"""Oracle parity for the pre-staged round-14 registry candidates
(tools/staging_r14.py) — the same normalize-and-compare as
tests/test_oracle_parity.py, so lifting them into the registry next round
is a no-risk move (the r12/r13 lifts followed exactly this playbook)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity_common import TABLES, normalize as _normalize  # noqa: E402
from staging_r14 import STAGED, STAGED_ORACLES  # noqa: E402

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
    # keeping these OUT of the registry until the round-14 rotation commit
    assert not set(STAGED) & set(entry_mod.queries())


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


def test_ts_pattern_similarity_matches_pure_python_model(spark):
    """Independent-implementation check for ts_pattern_similarity: the
    row's DuckDB oracle is GENERATED from the same TS_PATTERN constants
    and sum expressions, so a shared formula bug would pass parity (the
    r12 OLS lesson). Recompute the full top-20 from the raw parquet with
    plain Python integer arithmetic — exact equality required."""
    from collections import Counter, defaultdict

    import duckdb

    from staging_r14 import TS_PATTERN, _P_NORM2, ts_pattern_similarity

    rows = duckdb.execute(
        f"select user_id, hour(ts) as h from '{SF_DIR}/events.parquet'"
    ).fetchall()
    prof = defaultdict(Counter)
    for uid, h in rows:
        prof[uid][h] += 1
    model = []
    for uid, c in prof.items():
        dot = sum(c[h] * TS_PATTERN[h] for h in range(24))
        n2 = sum(c[h] * c[h] for h in range(24))
        model.append((dot * dot * 1000 // (n2 * _P_NORM2), uid, n2))
    model.sort(key=lambda t: (-t[0], t[1]))
    want = [(uid, sim, n2) for sim, uid, n2 in model[:20]]
    got = [
        (r["user_id"], r["sim_milli"], r["profile_norm2"])
        for r in ts_pattern_similarity(spark, SF_DIR).collect()
    ]
    assert got == want
