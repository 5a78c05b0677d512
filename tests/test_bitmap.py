"""Bitmap exact-distinct family (functions/bitmap.py) + the other r11
registry rows' local guarantees (AES fixed-IV GCM, listagg ordering,
TABLESAMPLE plan shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_custom_transforms_spark.functions.bitmap import (
    bucket_bitmaps,
    distinct_counts,
    merge_bitmaps,
)
from kafka_custom_transforms_spark.sources.tables import load_table


def _counts(df, key, groups):
    return {
        tuple(r[g] for g in groups): r.n_distinct
        for r in distinct_counts(bucket_bitmaps(df, key, groups), groups).collect()
    }


def test_bitmap_distinct_matches_count_distinct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    got = _counts(ev, "user_id", ["event_type"])
    want = {
        (r.event_type,): r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_bitmap_distinct_is_partitioning_invariant(spark, sf_dir):
    """Bit-set union is commutative/idempotent: any partitioning builds
    the same bitmaps, so the counts cannot drift with layout."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    assert _counts(ev.repartition(1), "user_id", ["event_type"]) == _counts(
        ev.repartition(13, "user_id"), "user_id", ["event_type"]
    )


def test_bitmap_or_merge_is_lossless(spark):
    """Finer-grained bitmaps OR-merged up equal the directly-built ones —
    including keys duplicated ACROSS the finer groups, the case where
    approximate sketch merges and naive count-sums both break."""
    rows = [("a", d, k) for d in range(3) for k in range(0, 40000, 7)] + [
        ("b", 0, 1),
        ("b", 1, 1),  # same key in two days: union must count it once
        ("b", 2, 99999),
    ]
    df = spark.createDataFrame(rows, "g string, day int, k long")
    direct = _counts(df, "k", ["g"])
    fine = bucket_bitmaps(df, "k", ["g", "day"])
    merged = {
        (r.g,): r.n_distinct
        for r in distinct_counts(merge_bitmaps(fine, ["g"]), ["g"]).collect()
    }
    assert merged == direct
    assert direct[("b",)] == 2


def test_bitmap_exact_over_negative_keys(spark):
    """(bucket_number, bit_position) is a bijection over the full long
    range — negative keys land in buckets <= 0 without aliasing any
    positive key's bit."""
    df = spark.range(-50000, 50000).select(
        F.lit("g").alias("g"), F.col("id").alias("k")
    )
    df = df.unionAll(df)  # duplicates must collapse
    assert _counts(df, "k", ["g"]) == {("g",): 100000}


def test_bitmap_excludes_null_keys(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 1), ("b", None)], "g string, k long"
    )
    got = _counts(df, "k", ["g"])
    # group b has only null keys: no bitmap rows at all, like count(distinct)
    assert got == {("a",): 1}


def test_bitmap_agg_has_map_side_partials(spark, sf_dir):
    """The scale claim: ONE exchange keyed on (group, bucket), with the
    bitmap aggregate split into partial (map-side) + final — repeats
    collapse before the shuffle."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    bm = bucket_bitmaps(ev, "user_id", ["event_type"])
    plan = bm._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "partial_bitmap_construct_agg" in plan.lower().replace(" ", "_") or (
        "ObjectHashAggregate" in plan and plan.count("ObjectHashAggregate") >= 2
    ), plan


def test_aes_wrong_key_is_always_null_multi_block(spark):
    """GCM's tag check guarantees NULL on a wrong key for ANY plaintext
    length (ECB's PKCS padding would false-positive ~0.4% of rows) —
    exercised across 1..3 AES blocks and the empty string."""
    texts = ["", "x", "a" * 15, "b" * 16, "c" * 33, "multi word text 123"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    iv = "000102030405060708090a0b"
    out = df.select(
        F.expr(
            f"try_aes_decrypt(aes_encrypt(t, '0123456789abcdef', 'GCM',"
            f" 'DEFAULT', unhex('{iv}')), 'fedcba9876543210', 'GCM')"
        ).alias("wrong"),
        F.expr(
            f"cast(aes_decrypt(aes_encrypt(t, '0123456789abcdef', 'GCM',"
            f" 'DEFAULT', unhex('{iv}')), '0123456789abcdef', 'GCM') as string)"
        ).alias("right"),
        F.length(
            F.expr(
                f"aes_encrypt(t, '0123456789abcdef', 'GCM', 'DEFAULT',"
                f" unhex('{iv}'))"
            )
        ).alias("ct_len"),
        "t",
    ).collect()
    for r in out:
        assert r.wrong is None
        assert r.right == r.t
        assert r.ct_len == len(r.t) + 28  # 12-byte IV + plaintext + 16-byte tag


def test_listagg_equals_sorted_collect_list(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier").select("s_nationkey", "s_name")
    got = {
        r.s_nationkey: r.csv
        for r in sup.groupBy("s_nationkey")
        .agg(
            F.expr("listagg(s_name, ',') within group (order by s_name)").alias("csv")
        )
        .collect()
    }
    want = {
        r.s_nationkey: ",".join(r.names)
        for r in sup.groupBy("s_nationkey")
        .agg(F.sort_array(F.collect_list("s_name")).alias("names"))
        .collect()
    }
    assert got == want


def test_tablesample_sits_directly_above_scan(spark, sf_dir):
    """The scale claim of the tablesample row: the Sample operator runs
    BEFORE any downstream work — no filter/join/agg below it."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    o.createOrReplaceTempView("kcts_ts_plan_probe")
    s = spark.sql(
        "select o_orderkey from kcts_ts_plan_probe"
        " tablesample (10 percent) repeatable (42)"
    )
    plan = s._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Sample" in plan, plan
    after_sample = plan.split("Sample", 1)[1]
    assert "Join" not in after_sample and "Aggregate" not in after_sample, plan
