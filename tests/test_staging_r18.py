"""Oracle parity for the pre-staged round-18 registry candidates
(tools/staging_r18.py) — the same normalize-and-compare as
tests/test_oracle_parity.py, so lifting them into the registry in round
18 is a no-risk move (rounds 14-17 lift their own staged modules first,
same playbook as the r12/r13 lifts)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity_common import TABLES, normalize as _normalize  # noqa: E402
from staging_r18 import STAGED, STAGED_ORACLES  # noqa: E402

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
    for mod in ("staging_r15", "staging_r16", "staging_r17"):
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
    lift cannot surprise it (chi2's zero-cell grid is the row this
    exists for: a bare crossJoin of the margin dims would plan BNLJ)."""
    from kafka_custom_transforms_spark.plans.explain import plan_str

    p = plan_str(STAGED[name](spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def _raw_events():
    return duckdb.execute(
        "select user_id, event_id, event_type, "
        "epoch_us(cast(ts as timestamp)) as t_us, "
        "date_diff('day', DATE '2024-01-01', cast(ts as date)) as day "
        f"from '{SF_DIR}/events.parquet'"
    ).fetchall()


def test_asof_forward_matches_pure_python_scan(spark):
    """Independent-implementation check: per signup, linearly scan the
    user's purchases in plain Python (no windows, no joins) for the
    earliest strictly-later purchase within the hour."""
    from collections import defaultdict

    from staging_r18 import events_asof_forward

    by_user = defaultdict(list)
    for uid, eid, etype, t_us, _d in _raw_events():
        by_user[uid].append((t_us, eid, etype))
    want = {}
    for uid, rows in by_user.items():
        purchases = sorted(t for t, _e, ty in rows if ty == "purchase")
        for t_us, eid, etype in rows:
            if etype != "signup":
                continue
            nxt = next((p for p in purchases if t_us < p <= t_us + 3_600_000_000), None)
            want[eid] = (uid, None if nxt is None else nxt - t_us)
    got = {
        r["event_id"]: (r["user_id"], r["lag_us"])
        for r in events_asof_forward(spark, SF_DIR).collect()
    }
    assert got == want


def test_chi2_cells_satisfy_identities(spark):
    """Structural invariants independent of the oracle: the grid is
    complete (types x weekdays incl. zero cells), cell counts sum to N,
    and the total chi-square equals scipy-free direct recomputation from
    the raw contingency table in Python floats."""
    from collections import Counter

    from staging_r18 import chi2_event_weekday

    rows = chi2_event_weekday(spark, SF_DIR).collect()
    raw = _raw_events()
    n_cells = Counter()
    for _u, _e, etype, _t, day in raw:
        n_cells[(etype, day % 7)] += 1
    types = {etype for _u, _e, etype, _t, _d in raw}
    assert len(rows) == len(types) * 7
    assert sum(r["n"] for r in rows) == len(raw)
    r_m = Counter(etype for _u, _e, etype, _t, _d in raw)
    c_m = Counter(d % 7 for _u, _e, _t2, _t, d in raw)
    N = len(raw)
    want_total = sum(
        (N * n_cells[(t, w)] - r_m[t] * c_m[w]) ** 2 / (N * r_m[t] * c_m[w])
        for t in types
        for w in range(7)
    )
    got_total = sum(r["chi2_contrib"] for r in rows)
    assert got_total == pytest.approx(want_total, rel=1e-12)


def test_daily_deltas_telescope(spark):
    """Per type, the deltas telescope: first-day count + sum(deltas) ==
    last-day count, and exactly one NULL delta per type."""
    from collections import defaultdict

    from staging_r18 import daily_counts_delta

    series = defaultdict(list)
    for r in daily_counts_delta(spark, SF_DIR).collect():
        series[r["event_type"]].append((r["day"], r["cnt"], r["delta"]))
    for etype, rows in series.items():
        rows.sort()
        assert rows[0][2] is None, etype
        assert all(d is not None for _day, _c, d in rows[1:]), etype
        assert rows[0][1] + sum(d for _day, _c, d in rows[1:]) == rows[-1][1], etype


def test_bitmask_profiles_match_pure_python_fold(spark):
    from collections import defaultdict

    from staging_r18 import bitmask_profiles

    masks = defaultdict(int)
    for uid, _e, etype, _t, day in _raw_events():
        masks[(uid, day)] |= 1 << (ord(etype[0]) % 16)
    want = defaultdict(int)
    for m in masks.values():
        want[m] += 1
    got = {
        r["mask"]: r["n_user_days"] for r in bitmask_profiles(spark, SF_DIR).collect()
    }
    assert got == dict(want)
    assert len(got) > 1  # the whole point of per-day masks
