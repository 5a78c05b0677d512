"""Distributed global rank / ntile tests: equality with the single-task
window implementations, plan shape, and edge cases."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from kafka_custom_transforms_spark.functions.rank import global_rank, ntile_from_rank
from kafka_custom_transforms_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_global_rank_equals_window_row_number(spark):
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "event_type")
    order = [F.col("user_id").asc(), F.col("event_id").desc()]
    got = {
        r.event_id: r.rank
        for r in global_rank(ev, order, num_partitions=7).collect()
    }
    want = {
        r.event_id: r.rank
        for r in ev.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_global_rank_is_dense_one_based(spark):
    df = spark.createDataFrame([(i,) for i in [5, 3, 9, 1]], "k long")
    ranks = sorted(
        r.rank for r in global_rank(df, [F.col("k").asc()], num_partitions=3).collect()
    )
    assert ranks == [1, 2, 3, 4]


def test_ntile_from_rank_matches_window_ntile(spark):
    for n_rows, buckets in [(10, 4), (12, 4), (3, 4), (100, 7), (1, 1)]:
        df = spark.createDataFrame([(i,) for i in range(1, n_rows + 1)], "r long")
        got = {
            x.r: x.b
            for x in df.select(
                "r", ntile_from_rank(F.col("r"), n_rows, buckets).alias("b")
            ).collect()
        }
        want = {
            x.r: x.b
            for x in df.select(
                "r",
                F.ntile(buckets).over(Window.orderBy("r")).cast("long").alias("b"),
            ).collect()
        }
        assert got == want, (n_rows, buckets)


def test_ntile_query_has_no_global_window(spark):
    """The quartile query must not contain any Window node (the rank comes
    from range partitions + mapInPandas, the bucket from arithmetic)."""
    import __spark_entry__ as em
    from kafka_custom_transforms_spark.plans.explain import plan_str

    q = em.queries()["ntile_customer_quartiles"](spark, SF)
    plan = plan_str(q, "simple")
    assert "Window" not in plan, plan
    assert "MapInPandas" in plan
