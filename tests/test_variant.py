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


def test_from_xml_typed_paths_and_attributes(spark):
    """The three drift shapes the xml_events row relies on, pinned on
    literal payloads: element text, nested element, and ATTRIBUTE values
    (the XML-only mode, surfaced via the default '_'-prefixed field);
    a shape parsed against the unified schema leaves the other paths
    null, and malformed XML yields null rather than an error."""
    df = spark.createDataFrame(
        [
            ("<e><k>7</k></e>",),
            ("<e><n><k>8</k></n></e>",),
            ('<e k="9"/>',),
            ("not xml at all",),
        ],
        "x string",
    )
    sch = "k bigint, n struct<k bigint>, _k bigint"
    parsed = df.select(F.from_xml("x", sch).alias("p"))
    rows = parsed.select(
        F.col("p.k").alias("k"),
        F.col("p.n.k").alias("nk"),
        F.col("p._k").alias("ak"),
        F.coalesce("p.k", "p.n.k", "p._k").alias("got"),
    ).collect()
    assert [(r.k, r.nk, r.ak, r.got) for r in rows] == [
        (7, None, None, 7),
        (None, 8, None, 8),
        (None, None, 9, 9),
        (None, None, None, None),
    ]


def test_xml_events_row_matches_direct_aggregation(spark, sf_dir):
    """The registry row's from_xml extraction must recover exactly the
    base-column value for every event (sum and counts equal the direct
    JSON-props aggregation it was synthesized from)."""
    import __spark_entry__ as entry_mod
    from kafka_custom_transforms_spark.sources.tables import load_table

    got = {
        r.event_type: (r.n, r.sum_k, r.n_attr)
        for r in entry_mod.queries()["xml_events"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    ref = {
        r.event_type: (r.n, r.sum_k, r.n_attr)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(k).alias("sum_k"),
            F.sum((F.pmod(F.col("event_id"), F.lit(3)) == 2).cast("int"))
            .cast("long")
            .alias("n_attr"),
        )
        .collect()
    }
    assert got == ref
