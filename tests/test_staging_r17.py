"""Oracle parity for the pre-staged round-17 registry candidates
(tools/staging_r17.py) — the same normalize-and-compare as
tests/test_oracle_parity.py, so lifting them into the registry in round
17 is a no-risk move (rounds 14/15/16 lift their own staged modules
first, same playbook as the r12/r13 lifts)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity_common import TABLES, normalize as _normalize  # noqa: E402
from staging_r17 import STAGED, STAGED_ORACLES  # noqa: E402

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
    # keeping these OUT of the registry until the round-17 rotation
    # commit (and disjoint from any staging module still ahead in line;
    # already-lifted modules are deleted, so import defensively)
    assert not set(STAGED) & set(entry_mod.queries())
    for mod in ("staging_r15", "staging_r16"):
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


def _raw_events():
    return duckdb.execute(
        "select user_id, event_id, event_type, "
        "date_diff('day', DATE '2024-01-01', cast(ts as date)) as day, "
        "epoch_us(cast(ts as timestamp)) as s_us "
        f"from '{SF_DIR}/events.parquet'"
    ).fetchall()


def test_interval_coverage_matches_pure_python_sweep(spark):
    """Independent-implementation check: merge each user's intervals with
    a plain Python sweep over the raw parquet — no windows, no SQL — and
    require exact equality of (n_islands, covered_us)."""
    from collections import defaultdict

    from staging_r17 import interval_coverage_events

    ivs = defaultdict(list)
    for uid, eid, _t, _d, s in _raw_events():
        ivs[uid].append((s, s + (eid % 7 + 1) * 60_000_000))
    want = {}
    for uid, spans in ivs.items():
        spans.sort()
        islands = []
        for s, e in spans:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        want[uid] = (len(islands), sum(e - s for s, e in islands))
    got = {
        r["user_id"]: (r["n_islands"], r["covered_us"])
        for r in interval_coverage_events(spark, SF_DIR).collect()
    }
    assert got == want


def test_basket_pairs_matches_pure_python_sets(spark):
    """Independent-implementation check: rebuild the co-occurrence counts
    with Python sets per (user, day) basket."""
    from collections import defaultdict
    from itertools import combinations

    from staging_r17 import basket_pairs_events

    baskets = defaultdict(set)
    for uid, _e, etype, day, _s in _raw_events():
        baskets[(uid, day)].add(etype)
    want = defaultdict(int)
    for types in baskets.values():
        for a, b in combinations(sorted(types), 2):
            want[(a, b)] += 1
    got = {
        (r["type_a"], r["type_b"]): r["n_baskets"]
        for r in basket_pairs_events(spark, SF_DIR).collect()
    }
    assert got == dict(want)


def test_mad_matches_pure_python_lower_median(spark):
    """Independent-implementation check: percentile_disc(0.5) is the
    element at index ceil(n/2)-1 of the sorted values; recompute median
    and MAD that way from the raw parquet."""
    from collections import defaultdict

    from staging_r17 import mad_order_values

    rows = duckdb.execute(
        "select o_orderpriority, cast(round(o_totalprice*100) as bigint) "
        f"from '{SF_DIR}/orders.parquet'"
    ).fetchall()
    vals = defaultdict(list)
    for prio, cents in rows:
        vals[prio].append(cents)

    def disc_median(xs):
        xs = sorted(xs)
        return xs[-(-len(xs) // 2) - 1]

    want = {}
    for prio, xs in vals.items():
        m = disc_median(xs)
        want[prio] = (len(xs), m, disc_median([abs(x - m) for x in xs]))
    got = {
        r["o_orderpriority"]: (r["n"], r["median_cents"], r["mad_cents"])
        for r in mad_order_values(spark, SF_DIR).collect()
    }
    assert got == want


def test_event_paths_conserve_sessions(spark, ddb):
    """sum(n_sessions) over paths == number of (user, day) sessions, and
    every path's event count reconstructs: total '>' separators + total
    sessions == total events (each event contributes exactly one path
    element)."""
    from staging_r17 import event_paths_daily

    rows = event_paths_daily(spark, SF_DIR).collect()
    n_sessions = sum(r["n_sessions"] for r in rows)
    n_elems = sum((r["path"].count(">") + 1) * r["n_sessions"] for r in rows)
    want_sessions, want_events = ddb.execute(
        "select count(*), sum(cnt) from ("
        "  select user_id, cast(ts as date) d, count(*) cnt"
        "  from events group by user_id, cast(ts as date))"
    ).fetchone()
    assert n_sessions == want_sessions
    assert n_elems == want_events
