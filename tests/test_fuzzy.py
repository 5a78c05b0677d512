"""Fuzzy (edit-distance) join tests: blocking recall properties + plan."""

from __future__ import annotations

import pytest

from kafka_custom_transforms_spark.operators.fuzzy import fuzzy_join


@pytest.fixture(scope="module")
def names(spark):
    left = spark.createDataFrame(
        [(1, "martha"), (2, "jon"), (3, "zzzz")], "lid long, lname string"
    )
    right = spark.createDataFrame(
        [(10, "marta"), (11, "john"), (12, "aartha")], "rid long, rname string"
    )
    return left, right


def test_length_blocking_is_lossless(names):
    left, right = names
    got = {
        (r.lid, r.rid, r.dist)
        for r in fuzzy_join(left, right, "lname", "rname", max_dist=1).collect()
    }
    # martha~marta (del, 1), martha~aartha (sub, 1), jon~john (ins, 1)
    assert got == {(1, 10, 1), (1, 12, 1), (2, 11, 1)}


def test_prefix_blocking_documented_recall_loss(names):
    left, right = names
    got = {
        (r.lid, r.rid)
        for r in fuzzy_join(
            left, right, "lname", "rname", max_dist=1, block="prefix", prefix_len=3
        ).collect()
    }
    # loses martha~aartha (edit inside the prefix) and jon~john
    # (prefix 'jon' vs 'joh'); keeps martha~marta ('mar' == 'mar')
    assert got == {(1, 10)}


def test_fuzzy_join_has_no_cartesian(spark, names):
    from kafka_custom_transforms_spark.plans.explain import plan_str

    left, right = names
    plan = plan_str(fuzzy_join(left, right, "lname", "rname"), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_length_blocking_equals_brute_force_on_random_strings(spark):
    """Losslessness, verified against the O(n*m) ground truth: over random
    short strings (small alphabet -> many near-collisions), the blocked
    join must return EXACTLY the pairs the exhaustive cross join finds."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(20260814)
    mk = lambda: "".join(rng.choice("ab") for _ in range(rng.randint(2, 5)))
    left = spark.createDataFrame(
        [(i, mk()) for i in range(30)], "lid long, lname string"
    )
    right = spark.createDataFrame(
        [(i, mk()) for i in range(30)], "rid long, rname string"
    )
    blocked = {
        (r.lid, r.rid)
        for r in fuzzy_join(left, right, "lname", "rname", max_dist=1).collect()
    }
    brute = {
        (r.lid, r.rid)
        for r in left.crossJoin(right)
        .filter(F.levenshtein("lname", "rname") <= 1)
        .collect()
    }
    assert blocked == brute
    assert len(brute) > 0  # the fixture actually exercises matches


def test_unknown_block_family_raises(names):
    left, right = names
    with pytest.raises(ValueError, match="block"):
        fuzzy_join(left, right, "lname", "rname", block="soundex")


def test_fuzzy_join_same_column_name_both_sides(spark):
    """left_col == right_col (the natural linkage shape) must not raise
    AMBIGUOUS_REFERENCE: the metric runs on internal copies."""
    from kafka_custom_transforms_spark.operators.fuzzy import fuzzy_join

    a = spark.createDataFrame([(1, "kafka")], "a_id long, name string")
    b = spark.createDataFrame([(2, "kafkb"), (3, "zzz")], "b_id long, name string")
    out = fuzzy_join(a, b, "name", "name", max_dist=1)
    rows = out.select("a_id", "b_id", "dist").collect()
    assert [(r["a_id"], r["b_id"], r["dist"]) for r in rows] == [(1, 2, 1)]
