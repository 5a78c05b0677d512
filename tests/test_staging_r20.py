"""Oracle parity for the pre-staged round-20 registry candidates
(tools/staging_r20.py) — the same normalize-and-compare as
tests/test_oracle_parity.py; with this module the staging runway covers
every remaining round of the build."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity_common import TABLES, normalize as _normalize  # noqa: E402
from staging_r20 import STAGED, STAGED_ORACLES  # noqa: E402

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
                "staging_r18", "staging_r19"):
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
    lift cannot surprise it (the LOCF spine and the grand-total attach
    are the rows this caught in staging: both originally used
    literal-true joins that plan BNLJ)."""
    from kafka_custom_transforms_spark.plans.explain import plan_str

    p = plan_str(STAGED[name](spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_weighted_median_matches_expansion_model(spark):
    """Ground truth: expand every lineitem into l_quantity copies of its
    cents value and take the plain lower median — the definitionally
    correct weighted median, computed with no windows at all."""
    from collections import defaultdict

    from staging_r20 import weighted_median_qty

    rows = duckdb.execute(
        "select l_returnflag, cast(round(l_extendedprice*100) as bigint), "
        "cast(l_quantity as bigint) "
        f"from '{SF_DIR}/lineitem.parquet'"
    ).fetchall()
    expanded = defaultdict(list)
    for flag, cents, w in rows:
        expanded[flag].extend([cents] * w)
    want = {}
    for flag, vals in expanded.items():
        vals.sort()
        # smallest value whose cumulative weight reaches half the total
        # == element at ceil(n/2)-1 of the expansion (lower median)
        want[flag] = (vals[-(-len(vals) // 2) - 1], len(vals))
    got = {
        r["l_returnflag"]: (r["wmedian_cents"], r["total_weight"])
        for r in weighted_median_qty(spark, SF_DIR).collect()
    }
    assert got == want


def test_drawdown_is_monotone_peak(spark):
    from staging_r20 import revenue_drawdown

    rows = sorted(
        (r["day"], r["revenue_cents"], r["peak_cents"], r["drawdown_cents"])
        for r in revenue_drawdown(spark, SF_DIR).collect()
    )
    peak = -1
    for _day, rev, p, dd in rows:
        peak = max(peak, rev)
        assert p == peak
        assert dd == peak - rev
        assert dd >= 0


def test_locf_matches_pure_python_carry(spark):
    from collections import defaultdict

    from staging_r20 import events_locf_daily

    raw = duckdb.execute(
        "select event_type, "
        "date_diff('day', DATE '2024-01-01', cast(ts as date)) as day, count(*) "
        f"from '{SF_DIR}/events.parquet' group by 1, 2"
    ).fetchall()
    obs = defaultdict(dict)
    days = set()
    for t, d, c in raw:
        obs[t][d] = c
        days.add(d)
    lo, hi = min(days), max(days)
    want = {}
    for t, series in obs.items():
        carry = 0
        for d in range(lo, hi + 1):
            if d in series:
                carry = series[d]
            want[(t, d)] = (carry, 1 if d in series else 0)
    got = {
        (r["event_type"], r["day"]): (r["cnt_locf"], r["observed"])
        for r in events_locf_daily(spark, SF_DIR).collect()
    }
    assert got == want


def test_nation_shares_sum_to_parent(spark):
    """Integer-division shares: each region's nation ppms sum to within
    n_nations of 1e6 (floor rounding loses < 1 ppm per nation), and
    nation cents conserve exactly."""
    from collections import defaultdict

    from staging_r20 import nation_share_ppm

    rows = nation_share_ppm(spark, SF_DIR).collect()
    by_region = defaultdict(list)
    for r in rows:
        by_region[r["r_name"]].append(r)
    for rname, rs in by_region.items():
        ppm_sum = sum(r["nation_share_ppm"] for r in rs)
        assert 1_000_000 - len(rs) < ppm_sum <= 1_000_000, rname
        region_ppms = {r["region_share_ppm"] for r in rs}
        assert len(region_ppms) == 1, rname
    total_ppm = sum(rs[0]["region_share_ppm"] for rs in by_region.values())
    assert 1_000_000 - len(by_region) < total_ppm <= 1_000_000
