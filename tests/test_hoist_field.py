"""ExtendedHoistField parity tests — one per branch of SURVEY.md §2.2,
mirroring ExtendedHoistFieldTest.java (field=magic,
keepInRootFieldNames=keepInRoot,keepInRoot2)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row, functions as F

from kafka_custom_transforms_spark import hoist_field


def _flat_struct_df(spark, should=42, keep1=1, keep2=2):
    return spark.createDataFrame(
        [(should, keep1, keep2)],
        "shouldBeMoved int, keepInRoot int, keepInRoot2 int",
    ).select(F.struct("shouldBeMoved", "keepInRoot", "keepInRoot2").alias("value"))


def test_schema_partition(spark):
    """ExtendedHoistFieldTest.java:114-136 — movable fields go under magic,
    keep-list fields stay at root."""
    out = hoist_field("magic", ["keepInRoot", "keepInRoot2"])(_flat_struct_df(spark))
    row = out.collect()[0].value
    assert row.keepInRoot == 1 and row.keepInRoot2 == 2
    assert row.magic.shouldBeMoved == 42
    assert out.select(F.to_json("value")).collect()[0][0] == (
        '{"keepInRoot":1,"keepInRoot2":2,"magic":{"shouldBeMoved":42}}'
    )


def test_schema_all_kept_is_identity(spark):
    """H5 (ExtendedHoistFieldTest.java:139-158): nothing moves -> same df."""
    df = spark.createDataFrame([(1, 2)], "keepInRoot int, keepInRoot2 int").select(
        F.struct("keepInRoot", "keepInRoot2").alias("value")
    )
    out = hoist_field("magic", ["keepInRoot", "keepInRoot2"])(df)
    assert out is df


def test_schema_all_movable_null_gives_null_inner(spark):
    """H4 (ExtendedHoistFieldTest.java:161-182): every movable field null ->
    magic itself is null (omitted in the JSON rendering)."""
    df = spark.createDataFrame(
        [Row(shouldBeMoved=None, keepInRoot=1, keepInRoot2=2)],
        "shouldBeMoved int, keepInRoot int, keepInRoot2 int",
    ).select(F.struct("shouldBeMoved", "keepInRoot", "keepInRoot2").alias("value"))
    out = hoist_field("magic", ["keepInRoot", "keepInRoot2"])(df)
    row = out.collect()[0].value
    assert row.magic is None
    assert out.select(F.to_json("value")).collect()[0][0] == (
        '{"keepInRoot":1,"keepInRoot2":2}'
    )


def test_schema_primitive_wrap(spark):
    """H6 (ExtendedHoistFieldTest.java:185-194): bare typed value wrapped."""
    df = spark.createDataFrame([(42,)], "value int")
    out = hoist_field("magic")(df)
    assert out.collect()[0].value.asDict() == {"magic": 42}


def test_schemaless_map_wrap_all(spark):
    """H1 over MapType."""
    df = spark.sql("select map('a', 1) as value")
    out = hoist_field("magic")(df)
    assert out.collect()[0].value == {"magic": {"a": 1}}


def test_schemaless_map_keep_in_root_rejected(spark):
    df = spark.sql("select map('a', 1) as value")
    with pytest.raises(ValueError, match="JSON"):
        hoist_field("magic", ["a"])(df)


def test_json_wrap_all_including_null_and_primitive(spark):
    """H1 over JSON text (ExtendedHoistFieldTest.java:42-50 wraps 42)."""
    df = spark.createDataFrame([("42",), ('{"a":1}',), (None,)], "value string")
    out = hoist_field("magic")(df)
    vals = [r.value for r in out.collect()]
    assert vals == ['{"magic":42}', '{"magic":{"a":1}}', '{"magic":null}']


def test_json_wrap_escapes_field_name(spark):
    """A field name containing quotes/backslashes must still yield valid
    JSON (the H1 splice JSON-escapes the literal key)."""
    df = spark.createDataFrame([('{"a":1}',)], "value string")
    out = hoist_field('we"ird\\name')(df)
    got = json.loads(out.collect()[0].value)
    assert got == {'we"ird\\name': {"a": 1}}


def test_json_partition_udf_path(spark):
    """H2 (ExtendedHoistFieldTest.java:53-72): partition; 76-111: omit magic
    when nothing moves."""
    df = spark.createDataFrame(
        [('{"shouldBeMoved":42,"keepInRoot":1}',), ('{"keepInRoot":1}',)],
        "value string",
    )
    out = hoist_field("magic", ["keepInRoot", "keepInRoot2"])(df)
    vals = [json.loads(r.value) for r in out.collect()]
    assert vals[0] == {"keepInRoot": 1, "magic": {"shouldBeMoved": 42}}
    assert vals[1] == {"keepInRoot": 1}  # no magic key at all


def test_json_partition_schema_fast_path(spark):
    df = spark.createDataFrame(
        [('{"shouldBeMoved":42,"keepInRoot":1,"keepInRoot2":2}',), ('{"keepInRoot":1}',)],
        "value string",
    )
    out = hoist_field(
        "magic",
        ["keepInRoot", "keepInRoot2"],
        json_schema="shouldBeMoved int, keepInRoot int, keepInRoot2 int",
    )(df)
    vals = [json.loads(r.value) for r in out.collect()]
    assert vals[0] == {"keepInRoot": 1, "keepInRoot2": 2, "magic": {"shouldBeMoved": 42}}
    assert vals[1] == {"keepInRoot": 1}


def test_json_partition_non_object_raises(spark):
    """getValueAsMap parity (ExtendedHoistField.java:52-60)."""
    df = spark.createDataFrame([("42",)], "value string")
    out = hoist_field("magic", ["keepInRoot"])(df)
    with pytest.raises(Exception, match="Map instance"):
        out.collect()


def test_field_required(spark):
    with pytest.raises(ValueError, match="required"):
        hoist_field("")


def test_key_target(spark):
    df = spark.sql("select 7 as key, 'v' as value")
    out = hoist_field("magic", target="key")(df)
    row = out.collect()[0]
    assert row.key.asDict() == {"magic": 7} and row.value == "v"
