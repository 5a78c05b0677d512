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
