"""contamination_flags unit tests: hand-computable fixture + plan shape."""

from __future__ import annotations

import pytest

from kafka_custom_transforms_spark.operators.decontaminate import contamination_flags


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 1 contains the benchmark sentence verbatim -> all grams hit
        (1, "the quick brown fox jumps over the lazy dog today"),
        # doc 2 shares a 8-gram window (first 9 words shifted by one)
        (2, "a the quick brown fox jumps over the lazy cat"),
        # doc 3 unrelated
        (3, "completely different words with no overlap at all whatsoever here"),
        # doc 4 too short for 8-grams
        (4, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_docs(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )


def test_contamination_counts(corpus, bench_docs):
    out = contamination_flags(corpus, bench_docs, ngram=8)
    got = {r.doc_id: r.n_bench_grams for r in out.collect()}
    # benchmark text has 9 words -> 2 distinct 8-grams
    # doc 1: contains both ("...dog" and "quick...lazy" windows) -> 2
    # doc 2: words 2..10 = benchmark words 1..9 -> shares both 8-grams? No:
    #   doc2 tokens: a the quick brown fox jumps over the lazy cat
    #   windows of 8: [a..the], [the..lazy], [quick..cat]
    #   "the quick brown fox jumps over the lazy" is benchmark window 1 -> 1 hit
    assert got == {1: 2, 2: 1, 3: 0, 4: 0}


def test_every_doc_present_with_zero(corpus, bench_docs):
    out = contamination_flags(corpus, bench_docs, ngram=8)
    assert out.count() == 4


def test_hashed_grams_match_raw(corpus, bench_docs):
    """The xxhash64-compressed broadcast path must equal the raw-string path
    on collision-free data (collisions are ~2^-64 per pair and can only
    OVER-flag — the hygiene-safe direction, documented)."""
    raw = {r.doc_id: r.n_bench_grams
           for r in contamination_flags(corpus, bench_docs, ngram=8).collect()}
    hashed = {r.doc_id: r.n_bench_grams
              for r in contamination_flags(corpus, bench_docs, ngram=8,
                                           hash_grams=True).collect()}
    assert hashed == raw == {1: 2, 2: 1, 3: 0, 4: 0}


def test_bloom_superset_of_raw(corpus, bench_docs):
    """Bloom membership can only OVER-flag: every truly contaminated gram
    passes the filter, so per-doc bloom counts dominate raw counts; with a
    roomy filter (few benchmark grams, 8192 bits) they are equal here."""
    from kafka_custom_transforms_spark.operators.decontaminate import (
        bloom_contamination_flags,
    )

    raw = {r.doc_id: r.n_bench_grams
           for r in contamination_flags(corpus, bench_docs, ngram=8).collect()}
    bloom = {r.doc_id: r.n_bloom_grams
             for r in bloom_contamination_flags(corpus, bench_docs, ngram=8).collect()}
    assert set(bloom) == set(raw)
    assert all(bloom[d] >= raw[d] for d in raw)
    assert bloom == raw  # 2 bench grams in 8192 bits: no false positives


def test_bloom_tiny_filter_overflags(corpus, bench_docs):
    """With m_bits=1 every probe hits a set bit, so every doc long enough to
    shingle is flagged for ALL its grams — pins the false-positive
    direction (over-flag, never under-flag)."""
    from kafka_custom_transforms_spark.operators.decontaminate import (
        bloom_contamination_flags,
    )

    out = {r.doc_id: r.n_bloom_grams
           for r in bloom_contamination_flags(
               corpus, bench_docs, ngram=8, m_bits=1, k_hashes=3).collect()}
    # doc1: 10 words -> 3 distinct grams; doc2: 10 words -> 3; doc3: 10 -> 3
    assert out == {1: 3, 2: 3, 3: 3, 4: 0}


def test_plan_broadcasts_benchmark_grams(corpus, bench_docs):
    plan = (
        contamination_flags(corpus, bench_docs, ngram=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_single_shingle_eval_per_side(corpus, bench_docs):
    """r15 optimization pin (guide §4.4): each side's text crosses the
    Python boundary exactly ONCE. Catalyst used to infer a size(sh) > 0
    filter from the explode and push it below the fan-out exchange by
    DUPLICATING the Arrow shingle UDF (4 ArrowEvalPython nodes for 2
    logical uses, the duplicates on the pre-fan-out scan side); the
    nondeterministic marking on the decontamination call sites forbids
    that."""
    plan = (
        contamination_flags(corpus, bench_docs, ngram=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 2, plan


def test_bloom_plan_shape(corpus, bench_docs):
    """r16 fused-probe pin: the Bloom variant's corpus side is ONE
    mapInPandas pass (tokenize + shingle + all k md5 probes — no gram
    strings recross the boundary, no (id, gram) shuffle), and the
    benchmark side is a lazily checkpointed bit table — the k broadcast
    semi-joins scan the checkpoint (<= m_bits longs), so the scorer plan
    carries ZERO Arrow shingle evals (without the checkpoint each
    broadcast re-derived the benchmark shingle pass: 3 ArrowEvalPython
    for one logical use)."""
    from kafka_custom_transforms_spark.operators.decontaminate import (
        bloom_contamination_flags,
    )

    plan = (
        bloom_contamination_flags(corpus, bench_docs, ngram=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1, plan
    assert plan.count("ArrowEvalPython") == 0, plan
    # all three probe joins are broadcast semi-joins over the checkpoint
    assert plan.count("LeftSemi, BuildRight") == 3, plan
