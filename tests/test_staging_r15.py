"""Oracle parity for the pre-staged round-15 registry candidates
(tools/staging_r15.py) — the same normalize-and-compare as
tests/test_oracle_parity.py, so lifting them into the registry in round
15 is a no-risk move (the r12/r13 lifts followed exactly this playbook;
r14 lifts tools/staging_r14.py first)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity_common import TABLES, normalize as _normalize  # noqa: E402
from staging_r15 import STAGED, STAGED_ORACLES  # noqa: E402

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
    # keeping these OUT of the registry until the round-15 rotation
    # commit
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


def test_bitmap_gsets_merge_matches_per_level_rebuild(spark):
    """Independent-implementation check for bitmap_gsets_distinct: the
    row's coarser levels OR-MERGE the finest bitmaps; rebuild each level
    from base data with its own bucket_bitmaps pass and require identical
    counts — pins the lossless-merge property itself, not just the final
    parity (the r12 OLS lesson: don't let both sides share one path)."""
    from kafka_custom_transforms_spark.functions.bitmap import (
        bucket_bitmaps,
        distinct_counts,
    )
    from staging_r15 import bitmap_gsets_distinct

    got = {
        (r["event_type"], r["week"]): r["n_distinct"]
        for r in bitmap_gsets_distinct(spark, SF_DIR).collect()
    }

    from pyspark.sql import functions as F

    from kafka_custom_transforms_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type",
        "user_id",
        F.expr(
            "cast(datediff(to_date(ts), date'2024-01-01') as long) div 7"
        ).alias("week"),
    )
    lvl1 = {
        (r["event_type"], None): r["n_distinct"]
        for r in distinct_counts(
            bucket_bitmaps(ev, "user_id", ["event_type"]), ["event_type"]
        ).collect()
    }
    lvl0_n = distinct_counts(bucket_bitmaps(ev, "user_id", []), []).collect()[0][
        "n_distinct"
    ]
    for key, val in lvl1.items():
        assert got[key] == val, key
    assert got[(None, None)] == lvl0_n


def test_activity_streaks_matches_pure_python_model(spark):
    """Independent-implementation check for activity_streaks: recompute
    the gaps-and-islands result with plain Python from the raw parquet —
    no windows, no SQL — and require exact equality."""
    from collections import defaultdict

    from staging_r15 import activity_streaks

    rows = duckdb.execute(
        "select distinct user_id, "
        "date_diff('day', DATE '2024-01-01', cast(ts as date)) as d "
        f"from '{SF_DIR}/events.parquet'"
    ).fetchall()
    days = defaultdict(list)
    for uid, d in rows:
        days[uid].append(d)
    want = {}
    for uid, ds in days.items():
        ds.sort()
        runs, cur = [], 1
        for prev, nxt in zip(ds, ds[1:]):
            if nxt == prev + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        want[uid] = (max(runs), len(ds), len(runs))
    got = {
        r["user_id"]: (r["max_streak"], r["n_active_days"], r["n_streaks"])
        for r in activity_streaks(spark, SF_DIR).collect()
    }
    assert got == want
