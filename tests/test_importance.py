"""DSIR-style importance scoring: selection behavior, integrity, and the
constant-size-broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_custom_transforms_spark.operators.importance import (
    bucket_ratio_table,
    importance_scores,
)
from kafka_custom_transforms_spark.plans.explain import plan_str
from kafka_custom_transforms_spark.sources.tables import load_table


def _toy_docs(spark):
    # target dialect: "alpha beta" bigrams; off-target: "zig zag"
    rows = [
        (1, "alpha beta alpha beta alpha", True),
        (2, "alpha beta gamma alpha beta", True),
        (3, "alpha beta alpha beta gamma", False),  # target-LIKE, not marked
        (4, "zig zag zig zag zig", False),
        (5, "zig zag quux zig zag", False),
        (6, "solo", False),  # < ngram words: zero grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")


def test_selects_target_like_content_regardless_of_label(spark):
    docs = _toy_docs(spark)
    out = importance_scores(docs, F.col("is_t"), n_buckets=64).collect()
    by_id = {r["doc_id"]: r for r in out}
    # docs sharing the target's bigrams select; disjoint-content docs don't
    assert by_id[1]["selected"] and by_id[2]["selected"]
    assert by_id[3]["selected"], "unlabeled doc with target-like content"
    assert not by_id[4]["selected"] and not by_id[5]["selected"]
    # gram-less doc: zero score, never selected
    assert by_id[6]["n_grams"] == 0 and by_id[6]["score_milli"] == 0
    assert not by_id[6]["selected"]
    # every input doc appears exactly once
    assert sorted(by_id) == [1, 2, 3, 4, 5, 6]


def test_score_is_partitioning_invariant(spark):
    docs = _toy_docs(spark)
    a = sorted(map(tuple, importance_scores(docs, F.col("is_t")).collect()))
    b = sorted(
        map(tuple, importance_scores(docs.repartition(7), F.col("is_t")).collect())
    )
    assert a == b


def test_ratio_table_bounded_and_broadcast(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    table = bucket_ratio_table(docs, F.col("lang") == "en", n_buckets=256)
    assert table.count() <= 256
    plan = plan_str(importance_scores(docs, F.col("lang") == "en"), "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_empty_target_scores_zero_not_error(spark):
    """ANSI mode would throw on the nt=0 division; an empty target must
    instead score every document 0 (nothing is representative)."""
    docs = _toy_docs(spark)
    out = importance_scores(docs, F.lit(False)).collect()
    assert all(r["score_milli"] == 0 and not r["selected"] for r in out)
    assert len(out) == 6


def test_ratio_table_survives_int64_overflow_scale(spark):
    """Advisor r3: ct * scale * nr used to run in bigint and overflow
    (ANSI ARITHMETIC_OVERFLOW) beyond ~3e6 grams. The decimal(38,0) route
    must (a) agree with the old bigint math where it didn't overflow and
    (b) not crash when the product exceeds int64 (forced via a huge
    scale, equivalent to a huge corpus)."""
    from kafka_custom_transforms_spark.operators.importance import bucket_ratio_table

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon", i % 2 == 0) for i in range(40)],
        "doc_id long, text string, is_t boolean",
    )
    small = {
        r.bucket: r.ratio_milli
        for r in bucket_ratio_table(docs, F.col("is_t"), n_buckets=16).collect()
    }
    assert small and all(isinstance(v, int) for v in small.values())
    big = {
        r.bucket: r.ratio_milli
        for r in bucket_ratio_table(
            docs, F.col("is_t"), n_buckets=16, scale=10**18
        ).collect()
    }
    # same ratios at 10^15x the scale (floor division; ratios here are exact)
    for b, v in small.items():
        assert big[b] == v * 10**15


def test_scores_single_text_pass_no_corpus_join(spark, sf_dir):
    """r15/r16 optimization pins: the per-doc score aggregates straight
    off the explode_outer gram stream (no SortMergeJoin resurrection of
    gram-less docs — r15), and since r16 the corpus text is tokenized/
    shingled/hashed ONCE: the gram stream is a lazy localCheckpoint that
    feeds both the ratio table and the scorer, so the scorer's physical
    plan contains NO parquet scan at all (every consumer reads the
    checkpointed RDDs; the r15 plan had three Generate-over-parquet
    passes) and at most one Generate (the checkpoint's own explode lives
    in its RDD lineage, not in this plan)."""
    import re

    docs = load_table(spark, sf_dir, "documents")
    plan = plan_str(importance_scores(docs, F.col("lang") == "en"))
    assert "SortMergeJoin" not in plan, plan
    # No sort above the first scan node (regex-anchored on the node id —
    # the literal "(1) Scan" slicing was fragile to node renumbering)
    m = re.search(r"\(\d+\) Scan", plan.split("== Physical Plan ==")[1])
    assert m is not None
    assert "Sort " not in plan.split("== Physical Plan ==")[1][: m.start()], plan
    assert not re.findall(r"\(\d+\) Scan parquet", plan), plan
    # grams (scorer) + counts (ratios) + counts (totals) = 3 RDD reads
    rdd_scans = re.findall(r"\(\d+\) Scan ExistingRDD", plan)
    assert len(rdd_scans) <= 3, plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 0, plan
