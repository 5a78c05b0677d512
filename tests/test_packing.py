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
