"""Greedy sequence packing."""

from __future__ import annotations

import pytest

from kafka_custom_transforms_spark.operators.packing import pack_sequences


def _pack(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, n_buckets=1, **kw)
    return {r.doc_id: (r.seq, r.pack_offset) for r in out.collect()}


def test_first_fit_hand_computed(spark):
    got = _pack(
        spark,
        [(1, 100), (2, 100), (3, 100), (4, 300), (5, 50)],
        context_len=256,
    )
    assert got == {
        1: (0, 0),  # fill 100
        2: (0, 100),  # fill 200
        3: (1, 0),  # 200+100 > 256 -> new seq
        4: (2, 0),  # oversize doc: its own sequence
        5: (3, 0),  # 300+50 > 256 -> new seq after the oversize one
    }


def test_oversize_first_doc_gets_seq_zero(spark):
    assert _pack(spark, [(1, 999), (2, 10)], context_len=256) == {
        1: (0, 0),
        2: (1, 0),
    }


def test_order_is_by_id_not_input_order(spark):
    got = _pack(spark, [(3, 50), (1, 50), (2, 50)], context_len=120)
    assert got == {1: (0, 0), 2: (0, 50), 3: (1, 0)}


def test_buckets_pack_independently(spark):
    df = spark.createDataFrame(
        [(i, 60) for i in range(40)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, context_len=128, n_buckets=4).collect()
    # every bucket packs exactly 2 docs per sequence (60+60 <= 128 < 180)
    per_seq: dict[tuple, int] = {}
    for r in out:
        per_seq[(r.bucket, r.seq)] = per_seq.get((r.bucket, r.seq), 0) + 1
    assert all(n <= 2 for n in per_seq.values())
    assert {r.bucket for r in out} <= set(range(4))
    # offsets within a window never exceed context_len - doc
    assert all(0 <= r.pack_offset <= 128 - 60 for r in out)


def test_bad_args(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="context_len"):
        pack_sequences(df, context_len=0)
    with pytest.raises(ValueError, match="bucket_hash"):
        pack_sequences(df, bucket_hash="fnv")


def test_packed_text_concatenates_in_offset_order(spark):
    from kafka_custom_transforms_spark.operators.packing import (
        pack_sequences,
        packed_text,
    )

    docs = spark.createDataFrame(
        [(1, "one", 100), (2, "two", 100), (3, "three", 100)],
        "doc_id long, text string, n_tokens long",
    )
    assignment = pack_sequences(docs.select("doc_id", "n_tokens"), context_len=256, n_buckets=1)
    out = packed_text(docs, assignment, sep=" ").collect()
    by_seq = {r.seq: r for r in out}
    assert by_seq[0].packed_text == "one two"  # ids 1,2 fill 200 of 256
    assert by_seq[0].n_docs == 2 and by_seq[0].n_tokens == 200
    assert by_seq[1].packed_text == "three"


# ---- property tests over the pure greedy core (no Spark job per example) --

from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=300),
)
def test_greedy_pack_invariants(token_counts, ctx):
    import pandas as pd

    from kafka_custom_transforms_spark.operators.packing import greedy_pack

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(token_counts)),
            "n_tokens": token_counts,
            "bucket": 0,
        }
    )
    out = greedy_pack(pdf.copy(), "doc_id", "n_tokens", ctx)
    # every doc assigned exactly once, order preserved by id
    assert sorted(out["doc_id"]) == list(range(len(token_counts)))
    by_id = out.sort_values("doc_id").reset_index(drop=True)
    # offsets are the running fill inside each sequence, fills respect ctx
    fills: dict[int, int] = {}
    for r in by_id.itertuples():
        assert r.pack_offset == fills.get(r.seq, 0)
        fills[r.seq] = r.pack_offset + r.n_tokens
    for s, fill in fills.items():
        docs_in_s = by_id[by_id["seq"] == s]
        assert fill <= ctx or len(docs_in_s) == 1  # only oversize docs overflow
    # greedy tightness: the first doc of seq s+1 did NOT fit in seq s
    seq_ids = sorted(fills)
    for prev_s, next_s in zip(seq_ids, seq_ids[1:]):
        assert next_s == prev_s + 1  # sequence ids are dense
        first_next = int(by_id[by_id["seq"] == next_s].iloc[0]["n_tokens"])
        assert fills[prev_s] + first_next > ctx


def test_packed_text_custom_tokens_col(spark):
    from kafka_custom_transforms_spark.operators.packing import (
        pack_sequences,
        packed_text,
    )

    docs = spark.createDataFrame(
        [(1, "aa", 2), (2, "bb", 3)], "doc_id long, text string, tok_count long"
    )
    asg = pack_sequences(docs, tokens_col="tok_count", context_len=8, n_buckets=1)
    out = packed_text(docs, asg, tokens_col="tok_count").collect()
    assert sum(r["n_docs"] for r in out) == 2
    assert sum(r["tok_count"] for r in out) == 5
