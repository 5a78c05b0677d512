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


def test_late_batch_is_actually_late():
    """Precondition that makes sessionize_late_merge a LATE-data test at
    all: the second file batch (event_id % 5 == 0) must contain rows
    OLDER than the first batch's maximum timestamp — if a data
    regeneration ever breaks this, the row silently degenerates into the
    ordinary two-batch case and must fail HERE with a clear message."""
    lo2, hi1 = duckdb.execute(
        f"""
        select (select min(ts) from '{SF_DIR}/events.parquet' where event_id % 5 = 0),
               (select max(ts) from '{SF_DIR}/events.parquet' where event_id % 5 != 0)
        """
    ).fetchone()
    assert lo2 < hi1, (
        "no late rows: the %5==0 batch starts after the on-time batch ends"
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


def test_ivf_upsert_recall_and_frozen_sizing(spark):
    """The frozen quantizer must not crater recall on this data (the
    retrain signal the operator documents), and the sizing must derive
    from the INDEXED subset: passing the indexed count explicitly as
    n_indexed reproduces the row bit-for-bit (no hidden union-sized
    count)."""
    from pyspark.sql import functions as F

    from kafka_custom_transforms_spark.operators import similarity
    from kafka_custom_transforms_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    indexed = emb.filter(F.col("vec_id") % 10 != 3)
    arriving = emb.filter(F.col("vec_id") % 10 == 3)
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    up = similarity.ivf_upsert_topk_neighbors(
        indexed, arriving, queries_df, k=5, n_probe=8, dim=64
    )
    got = {(r["query_id"], r["neighbor_id"]) for r in up.collect()}
    pinned = similarity.ivf_upsert_topk_neighbors(
        indexed, arriving, queries_df, k=5, n_probe=8, dim=64,
        n_indexed=indexed.count(),
    )
    assert got == {(r["query_id"], r["neighbor_id"]) for r in pinned.collect()}
    brute = similarity.topk_neighbors(
        emb, queries_df, k=5, dim=64, method="exact"
    )
    want = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, f"frozen-quantizer recall collapsed: {recall:.2f}"
