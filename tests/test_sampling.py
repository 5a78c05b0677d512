"""Deterministic hash sampling tests: reproducibility, slice disjointness,
cross-engine hash parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_custom_transforms_spark.functions.sampling import hash_bucket, hash_sample
from kafka_custom_transforms_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_sample_is_deterministic_and_partition_independent(docs):
    a = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 10).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in hash_sample(docs.repartition(7), "doc_id", 10).select("doc_id").collect()
    )
    assert a == b and len(a) > 0


def test_complementary_slices_partition_the_keyspace(docs):
    n = docs.count()
    train = hash_sample(docs, "doc_id", 90)
    holdout = docs.filter(hash_bucket(F.col("doc_id"), 100) >= 90)
    t, h = train.count(), holdout.count()
    assert t + h == n
    overlap = train.select("doc_id").intersect(holdout.select("doc_id")).count()
    assert overlap == 0
    # ~10% holdout, binomial tolerance
    assert 0.03 < h / n < 0.25


def test_bucket_matches_duckdb(docs, sf_dir):
    spark_sample = sorted(
        r.doc_id for r in hash_sample(docs, "doc_id", 10).select("doc_id").collect()
    )
    ddb = duckdb.sql(
        f"""select doc_id from '{sf_dir}/documents.parquet'
            where ('0x' || substr(md5(cast(doc_id as varchar)), 1, 14))::BIGINT
                  % 100 < 10"""
    ).fetchall()
    assert spark_sample == sorted(r[0] for r in ddb)


def test_bad_args_raise(docs):
    with pytest.raises(ValueError, match="buckets"):
        hash_bucket(F.col("doc_id"), 0)
    with pytest.raises(ValueError, match="num"):
        hash_sample(docs, "doc_id", 101, 100)


def test_mixture_sample_rates_and_determinism(spark):
    from kafka_custom_transforms_spark.functions.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(2000)], "k long, s string"
    )
    out = mixture_sample(df, "k", "s", {"a": 250}, default_pm=1000)
    rows = out.collect()
    a = [r.k for r in rows if r.s == "a"]
    b = [r.k for r in rows if r.s == "b"]
    assert len(b) == 1000  # default keeps everything
    assert 0.15 < len(a) / 1000 < 0.35  # ~25% of stratum a
    # deterministic: second run selects the identical rows
    again = mixture_sample(df, "k", "s", {"a": 250}).collect()
    assert sorted(r.k for r in again) == sorted(r.k for r in rows)
    # nests inside hash_sample slices built from the same key
    from kafka_custom_transforms_spark.functions.sampling import hash_sample

    sampled_keys = {r.k for r in hash_sample(df, "k", 250, 1000).collect() if r.s == "a"}
    assert set(a) == sampled_keys  # 250pm mixture == 250/1000 hash slice


def test_mixture_sample_validation(spark):
    from kafka_custom_transforms_spark.functions.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a")], "k long, s string")
    import pytest

    with pytest.raises(ValueError, match="rates_pm"):
        mixture_sample(df, "k", "s", {"a": 1500})
    with pytest.raises(ValueError, match="default_pm"):
        mixture_sample(df, "k", "s", {}, default_pm=-1)
