"""Embedding quantization / centroid / profile operator tests (hand-pinned
values; corpus-level parity covered by the oracle suite)."""

from __future__ import annotations

from kafka_custom_transforms_spark.operators.embeddings import (
    label_centroids,
    quantize_embeddings,
)
from kafka_custom_transforms_spark.operators.profile import column_profile


def test_quantize_maxabs_int8(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: (r.scale_ppm, r.q) for r in quantize_embeddings(df).collect()}
    # floor(-0.5 * 127 / 1.0) = floor(-63.5) = -64
    assert out[1] == (1_000_000, "127,-64,0")
    assert out[2] == (0, "0,0,0")  # zero vector guard


def test_label_centroids_fixed_point(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [2.0, 3.0], 0), (3, [10.0, -1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        (r.label, r.dim): (r.centroid_ppm, r.n)
        for r in label_centroids(df, dim=2).collect()
    }
    assert out == {
        (0, 0): (1_500_000, 2),
        (0, 1): (2_500_000, 2),
        (1, 0): (10_000_000, 1),
        (1, 1): (-1_000_000, 1),
    }


def test_linear_scores_hand_values(spark):
    from kafka_custom_transforms_spark.operators.embeddings import linear_scores

    df = spark.createDataFrame(
        [(1, [2.0, 4.0]), (2, [-2.0, 0.0])], "vec_id long, embedding array<float>"
    )
    # binary-exact values (powers of two) so the expectation needs no ulp
    # reasoning; cross-engine bit-exactness is separately oracle-pinned
    out = {r.vec_id: (r.margin_ppm, r.pos)
           for r in linear_scores(df, [0.5, 0.25], bias=0.0).collect()}
    # 1.0 + 1.0 = 2.0 ; -1.0
    assert out[1] == (2_000_000, True)
    assert out[2] == (-1_000_000, False)


def test_linear_scores_stay_in_codegen(spark):
    from kafka_custom_transforms_spark.operators.embeddings import linear_scores
    from kafka_custom_transforms_spark.plans.explain import plan_str
    from kafka_custom_transforms_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    plan = plan_str(linear_scores(emb, [0.1] * 64))
    assert "* Project" in plan
    assert "Exchange" not in plan


def test_column_profile_long_form(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k long, s string"
    )
    out = {r.col_name: r for r in column_profile(df).collect()}
    assert set(out) == {"k", "s"}
    k, s = out["k"], out["s"]
    assert (k.n_rows, k.n_null, k.n_distinct, k.min_str, k.max_str) == (3, 0, 2, "1", "2")
    assert (s.n_rows, s.n_null, s.n_distinct, s.min_str, s.max_str) == (3, 1, 2, "a", "b")


def test_column_profile_single_scan(spark):
    """The profile must be ONE pass: exactly one parquet/file scan in the
    plan, never a per-column union of scans."""
    from kafka_custom_transforms_spark.plans.explain import plan_str
    from kafka_custom_transforms_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    plan = plan_str(column_profile(orders), "simple")
    assert plan.count("FileScan") == 1, plan


def test_arrow_norms_rejects_ragged_and_matches_fold(spark):
    import pandas as pd
    import pytest

    from kafka_custom_transforms_spark.operators.embeddings import (
        arrow_vector_norms,
    )

    ok = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    rows = {r["vec_id"]: r for r in arrow_vector_norms(ok).collect()}
    assert rows[1]["norm_sq"] == 25.0 and rows[1]["n_dims"] == 2
    assert rows[2]["norm_sq"] == 5.0
    # ragged lengths WITHIN one Arrow batch break the reshape and must
    # raise (across batches each reshapes independently — that's fine)
    ragged = spark.createDataFrame(
        [(1, [1.0]), (2, [1.0, 2.0])], "vec_id long, embedding array<float>"
    ).coalesce(1)
    with pytest.raises(Exception):
        arrow_vector_norms(ragged).collect()


def test_arrow_norms_empty_vectors_score_zero(spark):
    from kafka_custom_transforms_spark.operators.embeddings import (
        arrow_vector_norms,
    )

    df = spark.createDataFrame(
        [(1, []), (2, [])], "vec_id long, embedding array<float>"
    ).coalesce(1)
    rows = sorted(map(tuple, arrow_vector_norms(df).collect()))
    assert rows == [(1, 0, 0.0), (2, 0, 0.0)]


def test_arrow_label_centroids_string_labels(spark):
    from kafka_custom_transforms_spark.operators.embeddings import (
        arrow_label_centroids,
    )

    df = spark.createDataFrame(
        [("spam", [1.0, -3.0]), ("spam", [2.0, -1.0]), ("ham", [10.0, 0.5])],
        "label string, embedding array<float>",
    )
    out = {r["label"]: r for r in arrow_label_centroids(df).collect()}
    assert out["spam"]["n"] == 2 and out["spam"]["c0_ppm"] == 1_500_000
    # negative sums: truncation toward zero, SQL semantics
    assert out["spam"]["c1_ppm"] == -2_000_000
    assert out["ham"]["c0_ppm"] == 10_000_000
