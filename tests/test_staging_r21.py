"""Oracle parity for the pre-staged round-21 registry candidates
(tools/staging_r21.py) — the same normalize-and-compare as
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
from staging_r21 import STAGED, STAGED_ORACLES  # noqa: E402

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
                "staging_r18", "staging_r19", "staging_r20"):
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
    lift cannot surprise it. For the two streaming rows the checked plan
    is the sink read-back + aggregate (the stream itself runs first)."""
    from kafka_custom_transforms_spark.plans.explain import plan_str

    p = plan_str(STAGED[name](spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_grouping_id_bitmask_is_consistent(spark):
    """Internal consistency of the provenance bits: gid == 2*g_status +
    g_prio on every row, and the three sets have the expected shapes
    (detail rows: both flags 0; per-status rows: prio rolled up; one
    grand-total row with both flags set)."""
    from staging_r21 import grouping_id_provenance

    rows = grouping_id_provenance(spark, SF_DIR).collect()
    assert all(r["gid"] == 2 * r["g_status"] + r["g_prio"] for r in rows)
    n_detail = sum(1 for r in rows if r["gid"] == 0)
    n_status = [r for r in rows if r["gid"] == 1]
    n_total = [r for r in rows if r["gid"] == 3]
    assert n_detail > len(n_status) > 0 and len(n_total) == 1
    assert all(r["o_orderpriority"] is None for r in n_status)
    assert n_total[0]["o_orderstatus"] is None
    # conservation: the grand total equals the sum of the detail rows
    assert n_total[0]["n"] == sum(r["n"] for r in rows if r["gid"] == 0)
    assert n_total[0]["sum_cents"] == sum(
        r["sum_cents"] for r in rows if r["gid"] == 0
    )


def test_eviction_counts_reconcile(spark, ddb):
    """matched + evicted == one row per purchase-match plus one per
    unmatched purchase, and n_purchases equals the raw purchase count."""
    from staging_r21 import stream_outer_eviction

    got = stream_outer_eviction(spark, SF_DIR).collect()[0]
    n_purch, n_match = ddb.execute(
        """
        with p as (select event_id, ts from events where event_type = 'purchase'),
             c as (select ts from events where event_type = 'click')
        select (select count(*) from p),
               (select count(*) from p join c
                  on c.ts between p.ts - interval 60 second and p.ts)
        """
    ).fetchone()
    assert got["n_purchases"] == n_purch
    assert got["n_matched_pairs"] == n_match
    assert got["n_evicted"] == n_purch - ddb.execute(
        """
        select count(distinct p.event_id)
        from (select event_id, ts from events where event_type = 'purchase') p
        join (select ts from events where event_type = 'click') c
          on c.ts between p.ts - interval 60 second and p.ts
        """
    ).fetchone()[0]


def test_bitmap_retention_matches_pure_python_model(spark):
    """Independent-implementation check for bitmap_retention: recompute
    adjacent-week retention with plain Python sets from the raw parquet
    — no bitmaps, no SQL joins — and require exact equality (pins the
    inclusion-exclusion identity itself, not just oracle parity)."""
    from collections import defaultdict

    from staging_r21 import bitmap_retention

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
