"""Kafka wire-format codecs: the binary record shape <-> the string envelope.

The spark-sql-kafka connector exposes records in a fixed wire schema
(:data:`KAFKA_WIRE_SCHEMA`) and its sink consumes binary key/value columns.
These pure DataFrame transforms isolate everything our source/sink helpers
do to that shape, so the ONLY untestable residue in this container (no
broker) is the literal ``.format("kafka")`` boilerplate —
:func:`~kafka_custom_transforms_spark.streaming.envelope.read_kafka_stream`
is now ``kafka source -> decode_wire`` and
:func:`~kafka_custom_transforms_spark.streaming.sinks.write_kafka_stream`
is ``encode_wire -> kafka sink``; the codecs themselves are unit- and
oracle-tested broker-free over wire-shaped frames built from testdata
(tests/test_kafka_wire.py, kafka_roundtrip query).

Reference parity: the Connect worker hands SMTs an already-deserialized
record; serialization lives in the worker's converters
(pom.xml:25-41 declares connect-json `provided` — the reference never
serializes either). UTF-8 string key/value is the JsonConverter-compatible
contract; the codecs are lossless for valid UTF-8 payloads.

Scale: both directions are pure per-row projections — no shuffle, no state,
fully codegen'd casts, stream- and batch-legal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["KAFKA_WIRE_SCHEMA", "decode_wire", "encode_wire", "wire_frame"]

# The exact columns the spark-sql-kafka source produces (connector contract).
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int, "
    "headers array<struct<key:string,value:binary>>"
)

_WIRE_COLS = [c.split()[0] for c in KAFKA_WIRE_SCHEMA.split(", ")]


def decode_wire(wire: DataFrame) -> DataFrame:
    """Kafka wire frame -> string envelope (the shape every SMT operates on):
    binary key/value cast to UTF-8 strings, ``timestamp`` renamed ``ts``,
    ``timestampType`` dropped (Connect exposes it via record metadata only),
    headers passed through unchanged.

    Tolerates a missing ``timestampType`` / ``headers`` column (older
    connector configs with ``includeHeaders=false``)."""
    cols = [
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("ts"),
    ]
    if "headers" in wire.columns:
        cols.append(F.col("headers"))
    else:
        cols.append(
            F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers")
        )
    return wire.select(*cols)


def encode_wire(env: DataFrame, topic: str | None = None) -> DataFrame:
    """String envelope -> Kafka sink frame: key/value encoded to UTF-8
    binary, plus ``topic`` (from the envelope column, or overridden by the
    ``topic`` argument) and ``headers`` when present — the full set of
    columns the Kafka sink accepts. ``partition``/``offset``/``ts`` are
    intentionally NOT emitted: the broker assigns them on produce.

    ``decode_wire`` after ``encode_wire`` restores key/value/topic/headers
    exactly for valid-UTF-8 strings (tests pin the round trip)."""
    cols = [
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
    ]
    if topic is not None:
        cols.append(F.lit(topic).alias("topic"))
    elif "topic" in env.columns:
        cols.append(F.col("topic"))
    if "headers" in env.columns:
        cols.append(F.col("headers"))
    return env.select(*cols)


def wire_frame(env: DataFrame, timestamp_type: int = 0) -> DataFrame:
    """Broker-free simulation of produce->consume: the full
    :data:`KAFKA_WIRE_SCHEMA` frame a consumer would read back after
    ``encode_wire(env)`` was produced — the broker-assigned metadata
    (partition / offset / timestamp) is taken from the envelope's own
    columns. This is the test stand-in that lets ``decode_wire`` /
    ``encode_wire`` be exercised end-to-end without a broker."""
    return env.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(int(timestamp_type)).alias("timestampType"),
        (F.col("headers") if "headers" in env.columns
         else F.lit(None).cast("array<struct<key:string,value:binary>>")).alias("headers"),
    )
