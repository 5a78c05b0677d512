"""VARIANT ingestion and SQL pipe-syntax tests: typed path extraction
across drifted payload shapes (including missing-path null semantics),
and pipe-syntax/classic-SQL equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_variant_get_typed_paths(spark):
    df = spark.createDataFrame(
        [
            ('{"k": 7}',),
            ('{"nested": {"k": 8}}',),
            ('{"arr": [9, 10]}',),
        ],
        "j string",
    )
    got = (
        df.withColumn("v", F.parse_json("j"))
        .select(
            F.coalesce(
                F.expr("variant_get(v, '$.k', 'long')"),
                F.expr("variant_get(v, '$.nested.k', 'long')"),
                F.expr("variant_get(v, '$.arr[0]', 'long')"),
            ).alias("k")
        )
        .collect()
    )
    assert sorted(r.k for r in got) == [7, 8, 9]


def test_variant_missing_path_is_null(spark):
    df = spark.createDataFrame([('{"other": 1}',)], "j string")
    row = (
        df.withColumn("v", F.parse_json("j"))
        .select(F.expr("variant_get(v, '$.k', 'long')").alias("k"))
        .collect()[0]
    )
    assert row.k is None


def test_variant_events_row_matches_direct_aggregation(spark, sf_dir):
    """The variant extraction must recover exactly props.k for every
    drifted shape — compare against the direct JSON aggregate."""
    import __spark_entry__ as entry_mod
    from kafka_custom_transforms_spark.sources.tables import load_table

    got = {
        r.event_type: (r.n, r.sum_k)
        for r in entry_mod._variant_events(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r.event_type: (r.n, r.sum_k)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.get_json_object("props", "$.k").cast("long")
            ).alias("sum_k"),
        )
        .collect()
    }
    assert got == want


def test_pipe_syntax_equals_classic_sql(spark, sf_dir):
    import __spark_entry__ as entry_mod
    from kafka_custom_transforms_spark.sources.tables import load_table

    got = sorted(
        (r.o_orderpriority, r.n_orders, round(r.total_price, 2))
        for r in entry_mod._sql_pipe_syntax(spark, sf_dir).collect()
    )
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_classic")
    want = sorted(
        (r.o_orderpriority, r.n_orders, round(r.total_price, 2))
        for r in spark.sql(
            """
            SELECT o_orderpriority, count(*) AS n_orders,
                   cast(sum(cast(o_totalprice AS decimal(18,2))) AS double)
                     AS total_price
            FROM orders_classic WHERE o_orderstatus <> 'F'
            GROUP BY o_orderpriority
            """
        ).collect()
    )
    assert got == want
