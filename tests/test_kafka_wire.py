"""Broker-free Kafka wire-format codec tests.

decode_wire / encode_wire / wire_frame are pure projections, so everything
the source/sink helpers do to records — except the literal
``.format("kafka")`` call — is exercised here without a broker.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_custom_transforms_spark import drop_fields, hoist_field, transform_chain
from kafka_custom_transforms_spark.sources.tables import load_table
from kafka_custom_transforms_spark.streaming.envelope import events_envelope
from kafka_custom_transforms_spark.streaming.kafka_wire import (
    KAFKA_WIRE_SCHEMA,
    decode_wire,
    encode_wire,
    wire_frame,
)


@pytest.fixture(scope="module")
def envelope(spark, sf_dir):
    return events_envelope(load_table(spark, sf_dir, "events"))


def test_wire_frame_has_connector_schema(spark, envelope):
    wire = wire_frame(envelope)
    expected = spark.createDataFrame([], KAFKA_WIRE_SCHEMA).schema
    assert [f.name for f in wire.schema.fields] == [f.name for f in expected.fields]
    assert [f.dataType for f in wire.schema.fields] == [f.dataType for f in expected.fields]


def test_decode_encode_roundtrip_exact(envelope):
    """decode(wire_frame(env)) == env for every envelope column."""
    back = decode_wire(wire_frame(envelope))
    assert back.columns == envelope.columns
    assert back.exceptAll(envelope).isEmpty()
    assert envelope.exceptAll(back).isEmpty()


def test_decode_without_headers_column(spark):
    wire = spark.createDataFrame(
        [(b"k1", b"v1", "t", 0, 7, None, 0)],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )
    row = decode_wire(wire).collect()[0]
    assert row.key == "k1" and row.value == "v1" and row.headers is None


def test_encode_topic_override_and_headers_passthrough(spark):
    env = spark.createDataFrame(
        [("k", "v", "orig", [("h1", b"\x00\xff")])],
        "key string, value string, topic string, "
        "headers array<struct<key:string,value:binary>>",
    )
    row = encode_wire(env, topic="override").collect()[0]
    assert row.topic == "override"
    assert row.key == b"k" and row.value == b"v"
    assert row.headers[0].key == "h1" and bytes(row.headers[0].value) == b"\x00\xff"


def test_encode_null_key_tombstone(spark):
    """Kafka tombstones: null key/value must stay null binary, not b'null'."""
    env = spark.createDataFrame([(None, None, "t")], "key string, value string, topic string")
    row = encode_wire(env).collect()[0]
    assert row.key is None and row.value is None


def test_smt_chain_over_decoded_wire_matches_direct(envelope):
    """The SMT chain over codec-round-tripped records equals the chain over
    the original envelope — the codec is transparent to every operator."""
    chain = transform_chain(
        drop_fields(["k"], json_schema="k int"),
        hoist_field("payload"),
    )
    direct = chain(envelope).select("offset", "key", "value")
    via_wire = chain(decode_wire(wire_frame(envelope))).select("offset", "key", "value")
    assert via_wire.exceptAll(direct).isEmpty()
    assert direct.exceptAll(via_wire).isEmpty()


def test_codecs_are_shuffle_free(envelope):
    plan = (
        decode_wire(wire_frame(envelope))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
