"""Oracle parity for the pre-staged round-13 registry candidates
(tools/staging_r13.py) — the same normalize-and-compare as
tests/test_oracle_parity.py, so lifting them into the registry next round
is a no-risk move (the r12 lift followed exactly this playbook)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity_common import TABLES, normalize as _normalize  # noqa: E402
from staging_r13 import STAGED, STAGED_ORACLES  # noqa: E402

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
    # keeping these OUT of the registry until the round-13 rotation commit
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


def test_ols_matches_duckdb_regr_builtins(spark, ddb):
    """Blindness-breaker for ols_quantity_price: the row's DuckDB oracle
    shares the closed-form expression with the Spark side, so a formula
    bug would pass parity (it DID — the r12 self-review caught an
    intercept off by 100x in the slope*mean_x term that both sides
    replicated). Check against DuckDB's INDEPENDENT regr_slope /
    regr_intercept implementation; tolerance covers its streaming-float
    accumulation vs our exact integer sufficient statistics."""
    got = {
        r["l_returnflag"]: r
        for r in STAGED["ols_quantity_price"](spark, SF_DIR).collect()
    }
    ref = ddb.execute(
        """
        select l_returnflag,
               regr_slope(l_extendedprice, l_quantity) as slope,
               regr_intercept(l_extendedprice, l_quantity) as intercept
        from lineitem group by l_returnflag
        """
    ).fetchall()
    assert len(ref) == len(got) > 0
    for flag, slope, intercept in ref:
        assert abs(got[flag]["slope"] - slope) <= 1e-6 * max(1.0, abs(slope))
        assert abs(got[flag]["intercept"] - intercept) <= 1e-6 * max(
            1.0, abs(intercept)
        ), (flag, got[flag]["intercept"], intercept)


def test_percentile_cont_matches_duckdb_quantile_cont(spark, ddb):
    """Independent-implementation check for percentile_cont_lineitem: the
    row's oracle DERIVES the pos=q*(n-1) convention with a window, so a
    shared misreading of the convention could pass parity. DuckDB's
    quantile_cont builtin implements the same SQL-standard convention
    independently — on this integer-valued data with quarter fractions
    every interpolation is exact, so equality is EXACT, not approximate."""
    got = {
        r["l_returnflag"]: (r["c25_qty"], r["c50_qty"], r["c75_qty"])
        for r in STAGED["percentile_cont_lineitem"](spark, SF_DIR).collect()
    }
    ref = ddb.execute(
        """
        select l_returnflag,
               quantile_cont(l_quantity, 0.25),
               quantile_cont(l_quantity, 0.50),
               quantile_cont(l_quantity, 0.75)
        from lineitem group by l_returnflag
        """
    ).fetchall()
    assert len(ref) == len(got) > 0
    for flag, *qs in ref:
        assert got[flag] == tuple(qs), (flag, got[flag], qs)
