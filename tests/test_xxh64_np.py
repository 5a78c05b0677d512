"""Bit-parity pins for the numpy XXH64 kernel and the fused MinHash
signature stage built on it (r16 optimization).

The fused stage is only a valid optimization if functions.xxh64_np is
bit-identical to Spark's xxhash64 — any divergence silently changes LSH
band collisions and therefore minhash_lsh_pairs results. These tests pin
that equivalence against Spark itself (not against a Python re-statement
of the algorithm) over every structural length class of the XXH64 spec,
and pin the fused signature against the split JVM-hash + numpy-min form
on real corpus text.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kafka_custom_transforms_spark.functions import texthash
from kafka_custom_transforms_spark.functions.xxh64_np import xxh64_bytes, xxh64_utf8
from kafka_custom_transforms_spark.operators.dedup import shingle_sets
from kafka_custom_transforms_spark.sources.tables import load_table


def test_known_vector():
    # Published XXH64 reference vector: XXH64("", seed=0).
    assert int(xxh64_bytes([b""], seed=0)[0]) == -1205034819632174695  # 0xEF46DB3751D8E999


def test_matches_spark_xxhash64_all_length_classes(spark):
    rng = random.Random(11)
    alphabet = "abcdefghij klmnop " + "αβγ語\U0001f642"
    strs = ["", "a", "naive", "café", "日本語", " x", "  "]
    # Every tail shape: len mod 32 in 0..31, plus 1- and 2-stripe bodies.
    for length in list(range(0, 80)) + [100, 128, 129, 200, 500]:
        strs.append("".join(rng.choice(alphabet) for _ in range(length)))
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    spark_vals = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    np_vals = xxh64_utf8(strs)
    assert [int(v) for v in np_vals] == spark_vals


def test_matches_spark_on_corpus_shingles(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sets = shingle_sets(docs, "doc_id", "text", 3, "arrow")
    grams = [
        r[0]
        for r in sets.select(F.explode("sh")).limit(2000).collect()
    ]
    df = spark.createDataFrame([(g,) for g in grams], "s string")
    spark_vals = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert [int(v) for v in xxh64_utf8(grams)] == spark_vals


def test_fused_signature_equals_split_form(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sets = shingle_sets(docs, "doc_id", "text", 3, "arrow").localCheckpoint()
    perms = texthash.minhash_perms(128)
    split = {
        r.id: list(r.sig)
        for r in texthash.minhash_signature_map(
            sets, perms, input_nonempty=True
        ).collect()
    }
    fused = {
        r.id: list(r.sig)
        for r in texthash.minhash_signature_map_fused(
            sets, perms, input_nonempty=True
        ).collect()
    }
    assert split == fused
    assert len(fused) > 0


def test_fused_signature_filters_empty_sets(spark):
    rows = [(1, "a b c d e"), (2, "x"), (3, ""), (4, "p q r s t u v w")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sets = shingle_sets(df, "doc_id", "text", 3, "arrow").localCheckpoint()
    perms = texthash.minhash_perms(16)
    split = {
        r.id: list(r.sig)
        for r in texthash.minhash_signature_map(sets, perms).collect()
    }
    fused = {
        r.id: list(r.sig)
        for r in texthash.minhash_signature_map_fused(sets, perms).collect()
    }
    assert split == fused
    assert sorted(fused) == [1, 4]


def test_fused_kernel_rejects_empty_set_with_nonempty_claim(spark):
    df = spark.createDataFrame([(1, [])], "id int, sh array<string>")
    perms = texthash.minhash_perms(4)
    with pytest.raises(Exception, match="empty shingle set"):
        texthash.minhash_signature_map_fused(
            df, perms, input_nonempty=True
        ).collect()
