"""Unit tests for functions/ordinal.global_ordinal — the scalable
zipWithIndex replacement staged for the round-16 registry lift
(tools/staging_r16.py: ordinal_assign_docs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_custom_transforms_spark.functions.ordinal import global_ordinal


def test_ordinal_matches_global_sort(spark):
    rows = [(i * 37 % 101,) for i in range(101)]  # a permutation of 0..100
    df = spark.createDataFrame(rows, ["k"])
    got = global_ordinal(df, "k", n_parts=8).collect()
    assert sorted(r["ordinal"] for r in got) == list(range(1, 102))
    by_ord = {r["ordinal"]: r["k"] for r in got}
    assert [by_ord[i] for i in range(1, 102)] == sorted(k for (k,) in rows)


def test_ordinal_more_partitions_than_rows(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], ["k"])
    got = {r["k"]: r["ordinal"] for r in global_ordinal(df, "k", n_parts=16).collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_ordinal_duplicates_consecutive_and_monotone(spark):
    df = spark.createDataFrame([(v,) for v in [5, 1, 5, 1, 3, 3, 3]], ["k"])
    got = global_ordinal(df, "k", n_parts=4).collect()
    assert sorted(r["ordinal"] for r in got) == list(range(1, 8))
    # ordinals must be monotone w.r.t. the key even where ties are
    # arbitrarily ordered within a value
    pairs = sorted((r["ordinal"], r["k"]) for r in got)
    assert [k for _, k in pairs] == sorted([5, 1, 5, 1, 3, 3, 3])


def test_ordinal_preserves_other_columns_and_count(spark):
    df = spark.range(0, 57).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    out = global_ordinal(df, "k", n_parts=5)
    assert set(out.columns) == {"k", "v", "ordinal"}
    rows = out.collect()
    assert len(rows) == 57
    for r in rows:
        assert r["v"] == r["k"] * 2
        assert r["ordinal"] == r["k"] + 1  # ids 0..56 -> ordinals 1..57


def test_small_input_auto_dispatches_to_plain_window(spark):
    """Below ORDINAL_WINDOW_MAX_BYTES with n_parts=None the measured
    crossover says one bounded sort task is the cheaper plan — the
    dispatch must produce it (no pid column machinery) with identical
    results."""
    from kafka_custom_transforms_spark.functions.ordinal import global_ordinal as go

    df = spark.range(0, 200).select(F.col("id").alias("k"))
    out = go(df, "k")  # no n_parts: tiny plan -> window path
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_go_pid" not in plan
    rows = {r["k"]: r["ordinal"] for r in out.collect()}
    assert rows == {k: k + 1 for k in range(200)}


def test_explicit_n_parts_pins_distributed_plan_even_when_small(spark):
    df = spark.range(0, 200).select(F.col("id").alias("k"))
    plan = (
        global_ordinal(df, "k", n_parts=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_go_pid" in plan


def test_ordinal_plan_has_no_global_window(spark):
    """The whole point: no empty-PARTITION-BY window over data rows.
    Every window in the plan must either partition by the pid column or
    run over the bounded counts frame (scan-free plan leg)."""
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    plan = global_ordinal(df, "k", n_parts=8)._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window \[(.*?)\]", plan):
        frag = m.group(0)
        assert ("_go_pid" in frag) or ("count" in frag), frag
