"""Independent-implementation checks for registry rows whose DuckDB
oracle SHARES a formula with the Spark side — shared-formula parity is
structurally blind to a bug both sides replicate (it happened: the r12
staging draft of ols_quantity_price had an intercept off by 100x that
its mirrored oracle reproduced; DuckDB's regr_intercept caught it).
These tests pin such rows against DuckDB builtins that implement the
same math INDEPENDENTLY.

Lifted from tests/test_staging_r13.py when the rows entered the registry
in round 13; unlike the staging tests these call the REGISTERED rows, so
they keep guarding against a future registry-side regression."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity_common import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_ols_matches_duckdb_regr_builtins(spark, ddb):
    """ols_quantity_price vs DuckDB's independent regr_slope /
    regr_intercept; tolerance covers its streaming-float accumulation vs
    our exact integer sufficient statistics."""
    import __spark_entry__ as entry_mod

    got = {
        r["l_returnflag"]: r
        for r in entry_mod.queries()["ols_quantity_price"](spark, SF_DIR).collect()
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
    """percentile_cont_lineitem's oracle DERIVES the pos=q*(n-1)
    convention with a window, so a shared misreading of the convention
    could pass parity. DuckDB's quantile_cont builtin implements the same
    SQL-standard convention independently — on this integer-valued data
    with quarter fractions every interpolation is exact, so equality is
    EXACT, not approximate."""
    import __spark_entry__ as entry_mod

    got = {
        r["l_returnflag"]: (r["c25_qty"], r["c50_qty"], r["c75_qty"])
        for r in entry_mod.queries()["percentile_cont_lineitem"](spark, SF_DIR).collect()
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


def test_ts_pattern_similarity_matches_pure_python_model(spark):
    """Independent-implementation check for ts_pattern_similarity: the
    row's DuckDB oracle is GENERATED from the same _TS_PATTERN constants
    and sum expressions, so a shared formula bug would pass parity (the
    r12 OLS lesson). Recompute the full top-20 from the raw parquet with
    plain Python integer arithmetic — exact equality required.
    Lifted from tests/test_staging_r14.py at the round-14 registry lift;
    now guards the REGISTERED row."""
    from collections import Counter, defaultdict

    import __spark_entry__ as entry_mod
    from __spark_entry__ import _TS_PATTERN, _TS_P_NORM2

    rows = duckdb.execute(
        f"select user_id, hour(ts) as h from '{SF_DIR}/events.parquet'"
    ).fetchall()
    prof = defaultdict(Counter)
    for uid, h in rows:
        prof[uid][h] += 1
    model = []
    for uid, c in prof.items():
        dot = sum(c[h] * _TS_PATTERN[h] for h in range(24))
        n2 = sum(c[h] * c[h] for h in range(24))
        model.append((dot * dot * 1000 // (n2 * _TS_P_NORM2), uid, n2))
    model.sort(key=lambda t: (-t[0], t[1]))
    want = [(uid, sim, n2) for sim, uid, n2 in model[:20]]
    got = [
        (r["user_id"], r["sim_milli"], r["profile_norm2"])
        for r in entry_mod.queries()["ts_pattern_similarity"](spark, SF_DIR).collect()
    ]
    assert got == want


def test_bitmap_gsets_merge_matches_per_level_rebuild(spark):
    """Independent-implementation check for bitmap_gsets_distinct: the
    registered row's coarser levels OR-MERGE the finest bitmaps; rebuild
    each level from base data with its own bucket_bitmaps pass and
    require identical counts — pins the lossless-merge property itself,
    not just the final parity (the r12 OLS lesson: don't let both sides
    share one path). Lifted from tests/test_staging_r15.py at the
    round-15 registry lift; now guards the REGISTERED row."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from kafka_custom_transforms_spark.functions.bitmap import (
        bucket_bitmaps,
        distinct_counts,
    )
    from kafka_custom_transforms_spark.sources.tables import load_table

    got = {
        (r["event_type"], r["week"]): r["n_distinct"]
        for r in entry_mod.queries()["bitmap_gsets_distinct"](
            spark, SF_DIR
        ).collect()
    }

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
    no windows, no SQL — and require exact equality. Lifted from
    tests/test_staging_r15.py at the round-15 registry lift; now guards
    the REGISTERED row."""
    from collections import defaultdict

    import __spark_entry__ as entry_mod

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
        for r in entry_mod.queries()["activity_streaks"](spark, SF_DIR).collect()
    }
    assert got == want


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_approx_topk_boundary_is_tie_free(sf_dir):
    """approx_topk_event_types' oracle is ORDER BY cnt DESC LIMIT 3 with
    no tie-break, and Spark's approx_top_k sketch has its own unspecified
    internal tie-break — parity is only deterministic because the k=3
    boundary is gap-separated on this data. That property lived in
    comments; pin it executably: the exact counts at rank 3 and rank 4
    must differ at both test scales, so a future data regeneration that
    introduces a boundary tie fails HERE with a clear message instead of
    as a nondeterministic hash mismatch in the driver gate."""
    con = duckdb.connect()
    counts = con.execute(
        f"""
        select count(*) as cnt
        from '{sf_dir}/events.parquet'
        group by event_type order by cnt desc
        """
    ).fetchall()
    con.close()
    assert len(counts) > 3, "k=3 boundary needs a rank-4 row to compare"
    rank3, rank4 = counts[2][0], counts[3][0]
    assert rank3 > rank4, (
        f"approx_topk_event_types k=3 boundary tie at {sf_dir}: "
        f"rank3={rank3} rank4={rank4} — the row's top-3 is no longer "
        "deterministic; add an explicit tie-break to both sides"
    )


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_event_day_index_is_non_negative(sf_dir):
    """Precondition for bitmap_gsets_distinct and activity_streaks
    parity: their day/week indexes come from datediff(ts, 2024-01-01),
    and Spark's `div` TRUNCATES toward zero while DuckDB's `//` FLOORS
    — identical on non-negative values only (-1 div 7 = 0 vs
    -1 // 7 = -1). If a data regeneration ever produces events before
    2024-01-01 the oracle mismatch would surface as an opaque hash
    failure in the driver gate; fail HERE with the real cause instead."""
    con = duckdb.connect()
    lo = con.execute(
        f"select min(cast(ts as date)) from '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    con.close()
    import datetime

    assert lo >= datetime.date(2024, 1, 1), (
        f"events at {sf_dir} start {lo} — before the 2024-01-01 epoch; "
        "the div-vs-// floor divergence now applies: switch both rows "
        "to an explicit floor_div or move the epoch before min(ts)"
    )


def test_moments_match_convention_converted_builtins(spark, ddb):
    """Independent-implementation check for moments_lineitem: DuckDB's
    skewness()/kurtosis() builtins use the SAMPLE conventions
    (bias-corrected g1 -> G1, excess kurtosis with the n-1 correction);
    convert our population statistics to those conventions and require
    agreement to 1e-9 relative — two genuinely different computations
    (power sums vs the builtins' streaming central-moment updates) must
    meet (the r12 OLS lesson: don't let both sides share one path).
    Lifted from tests/test_staging_r16.py at the round-16 registry
    lift; now guards the REGISTERED row."""
    import math

    import __spark_entry__ as entry_mod

    got = {
        r["l_returnflag"]: (r["n"], r["skew_qty"], r["kurt_qty"])
        for r in entry_mod.queries()["moments_lineitem"](spark, SF_DIR).collect()
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
    invariant independent of the oracle's window). Lifted from
    tests/test_staging_r16.py at the round-16 registry lift."""
    import __spark_entry__ as entry_mod

    total = sum(
        r["n_trans"]
        for r in entry_mod.queries()["event_transitions"](spark, SF_DIR).collect()
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
    ordinary two-batch case and must fail HERE with a clear message.
    Lifted from tests/test_staging_r16.py at the round-16 registry
    lift."""
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
    count). Lifted from tests/test_staging_r16.py at the round-16
    registry lift; now guards the REGISTERED row."""
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


def test_recursive_depth_matches_closed_form(spark):
    """recursive_cte_doc_depth vs the closed form: in the implicit binary
    tree i -> 2i+1, 2i+2 rooted at 0, depth(i) = floor(log2(i+1)) exactly.
    Pins the r16 two-level unroll (anchor = depths 0+1, step = grandchild
    at depth+2): the walk must still reach every doc exactly once with
    the same depth — a double-emitted or skipped frontier would show up
    as a wrong histogram even while the shared-SQL DuckDB oracle agrees
    (it runs the identical statement)."""
    import duckdb

    import __spark_entry__ as entry_mod

    got = {
        r["depth"]: (r["n_docs"], r["sum_chars"])
        for r in entry_mod.queries()["recursive_cte_doc_depth"](spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    ref = con.execute(
        f"""
        select cast(floor(log2(doc_id + 1)) as int) as depth,
               count(*) as n_docs, sum(n_chars) as sum_chars
        from '{SF_DIR}/documents.parquet' group by 1
        """
    ).fetchall()
    con.close()
    assert len(ref) == len(got) > 0
    for depth, n_docs, sum_chars in ref:
        assert got[depth] == (n_docs, sum_chars), (depth, got[depth], (n_docs, sum_chars))
