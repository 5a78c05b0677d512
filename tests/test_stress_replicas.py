"""Invariants of the scale-stress replica generator (tools/scale_stress.py
``_gen_dataset``) — the properties that make STRESS.md an honest scaling
measurement rather than a skew stress:

- documents: the word -> "w~c" substitution is a bijection into a
  disjoint namespace, so within-copy shingle-set Jaccard is preserved
  EXACTLY (the designed dup pairs and their gap survive bit-for-bit)
  while cross-copy shingle overlap is zero (dup RATE constant in K —
  naive replication would hand every doc K-1 near-duplicates and grow
  banded-join output quadratically).
- embeddings: the per-copy transform is orthogonal (signed coordinate
  permutation), so within-copy norms and cosines are preserved exactly.
- fact/dim tables: keys offset per copy, referential integrity holds per
  copy and key ranges are disjoint across copies; the events user_id
  offset is a multiple of 100, so the user_id%100 skew distribution is
  preserved exactly (the hot key keeps its share while its partition
  grows K-fold — the AQE-split stress).

Pure DuckDB/numpy — no Spark session. Generates a k=2 replica of
sf0.001 into tmp_path once per module.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from scale_stress import DOC_OFF, KEY_OFF, _gen_dataset  # noqa: E402

SRC = "/root/testdata/sf0.001"
K = 2


@pytest.fixture(scope="module")
def replica(tmp_path_factory):
    out = tmp_path_factory.mktemp("stress_k2")
    _gen_dataset(K, out, src=SRC)
    return str(out)


@pytest.fixture(scope="module")
def ddb(replica):
    con = duckdb.connect()
    con.execute(f"create view src_docs as select * from '{SRC}/documents.parquet'")
    con.execute(f"create view rep_docs as select * from '{replica}/documents.parquet'")
    for t in ("lineitem", "orders", "customer", "part", "events"):
        con.execute(f"create view rep_{t} as select * from '{replica}/{t}.parquet'")
        con.execute(f"create view src_{t} as select * from '{SRC}/{t}.parquet'")
    yield con
    con.close()


def _n_src(ddb):
    return ddb.execute("select count(*) from src_docs").fetchone()[0]


def test_document_counts_and_id_disjointness(ddb):
    n_src, n_rep = ddb.execute(
        "select (select count(*) from src_docs), (select count(*) from rep_docs)"
    ).fetchone()
    assert n_rep == K * n_src
    # DENSE offsets (r13): copy c occupies [c*n_src, (c+1)*n_src) so the
    # implicit binary doc tree spans the whole replica corpus — the ids
    # are a contiguous 0..K*n_src-1 range with no gaps
    per_copy = ddb.execute(
        f"select doc_id // {n_src} as c, count(*), count(distinct doc_id) "
        "from rep_docs group by 1 order by 1"
    ).fetchall()
    assert [(c, n, d) for c, n, d in per_copy] == [(c, n_src, n_src) for c in range(K)]
    lo, hi = ddb.execute("select min(doc_id), max(doc_id) from rep_docs").fetchone()
    assert (lo, hi) == (0, K * n_src - 1)


def test_within_copy_jaccard_preserved_exactly(ddb):
    """The word-level substitution must preserve every within-copy
    3-shingle Jaccard bit-for-bit: compare ALL pairwise Jaccards of the
    first 40 docs in copy 0 (identity) vs the same docs in copy 1
    (rewritten) — identical rational values, asserted as cross-multiplied
    integers (no float tolerance)."""
    def jaccards(view, off):
        rows = ddb.execute(
            f"""
            with toks as (
              select doc_id - {off} as d, string_split(text, ' ') as w
              from {view} where doc_id >= {off} and doc_id < {off} + 40
            ),
            sh as (
              select d, case when len(w) >= 3
                then list_distinct([array_to_string(w[i:i+2], ' ')
                                    for i in range(1, len(w) - 1)])
                else [] end as s
              from toks
            )
            select a.d, b.d,
                   len(list_intersect(a.s, b.s)) as inter,
                   len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) as uni
            from sh a join sh b on a.d < b.d
            order by 1, 2
            """
        ).fetchall()
        return rows

    j0 = jaccards("rep_docs", 0)
    j1 = jaccards("rep_docs", _n_src(ddb))
    assert len(j0) == len(j1) == 40 * 39 // 2
    for (a0, b0, i0, u0), (a1, b1, i1, u1) in zip(j0, j1):
        assert (a0, b0) == (a1, b1)
        assert i0 * u1 == i1 * u0, (a0, b0)  # equal rationals, exactly


def test_cross_copy_shingle_overlap_is_zero(ddb):
    """No word survives the ~c namespace substitution, so copy 0 and
    copy 1 share ZERO shingles — the dup rate stays constant in K."""
    n = ddb.execute(
        f"""
        with w0 as (select distinct unnest(string_split(text, ' ')) as w
                    from rep_docs where doc_id < {_n_src(ddb)}),
             w1 as (select distinct unnest(string_split(text, ' ')) as w
                    from rep_docs where doc_id >= {_n_src(ddb)})
        select count(*) from w0 join w1 using (w)
        """
    ).fetchone()[0]
    assert n == 0


def test_embedding_transform_is_orthogonal(replica):
    """Within-copy norms and pairwise dot products must be preserved
    exactly by the signed-permutation transform (float32 term REORDERING
    only — the sequential sums meet the same values in permuted order, so
    equality is within one rounding step; we assert exact equality of
    sorted absolute coordinate multisets and near-equality of dots)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{replica}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    vec = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    c0 = vec[ids < DOC_OFF]
    c1 = vec[ids >= DOC_OFF]
    assert c0.shape == c1.shape
    # signed permutation: the |coordinate| multiset of each vector is identical
    np.testing.assert_array_equal(np.sort(np.abs(c0), axis=1), np.sort(np.abs(c1), axis=1))
    # dots in float64 over float32 inputs: permutation-invariant summands,
    # compare exactly after sorting the products
    a0 = c0[:50]
    for i in range(0, 50, 10):
        p0 = np.sort((a0[i].astype(np.float64) * a0[(i + 3) % 50].astype(np.float64)))
        p1 = np.sort((c1[i].astype(np.float64) * c1[(i + 3) % 50].astype(np.float64)))
        np.testing.assert_array_equal(p0, p1)


def test_referential_integrity_per_copy_and_disjoint_keys(ddb):
    # every replicated lineitem row joins an order and a part IN ITS COPY
    orphans = ddb.execute(
        "select count(*) from rep_lineitem l left join rep_orders o "
        "on l.l_orderkey = o.o_orderkey where o.o_orderkey is null"
    ).fetchone()[0]
    assert orphans == 0
    part_orphans = ddb.execute(
        "select count(*) from rep_lineitem l left join rep_part p "
        "on l.l_partkey = p.p_partkey where p.p_partkey is null"
    ).fetchone()[0]
    assert part_orphans == 0
    # cross-copy join would be empty: keys of copy 1 are offset by KEY_OFF
    cross = ddb.execute(
        f"select count(*) from rep_lineitem l join rep_orders o "
        f"on l.l_orderkey = o.o_orderkey "
        f"where (l.l_partkey >= {KEY_OFF}) != (o.o_orderkey >= {KEY_OFF})"
    ).fetchone()[0]
    assert cross == 0


def test_events_skew_shape_preserved(ddb):
    """KEY_OFF % 100 == 0, so user_id % 100 — the skew key derivation in
    skew_join_aqe — has the IDENTICAL distribution in every copy."""
    assert KEY_OFF % 100 == 0
    rows = ddb.execute(
        f"""
        select user_id % 100 as k,
               sum(case when user_id < {KEY_OFF} then 1 else 0 end) as n0,
               sum(case when user_id >= {KEY_OFF} then 1 else 0 end) as n1
        from rep_events group by 1
        """
    ).fetchall()
    assert all(n0 == n1 for _, n0, n1 in rows)
