"""Kafka-envelope sources: the record shape the reference transforms live on.

The reference runs inside a Kafka Connect worker; its record envelope
(topic, partition, key, value, timestamp, headers — SURVEY.md §1.1) maps to
the Structured Streaming Kafka source schema. All SMT operators in this
package are envelope-agnostic column transforms, so the same chain object
runs on:

  - a real Kafka stream (:func:`read_kafka_stream`, requires a broker),
  - a file-backed stream for tests (:func:`stream_events_envelope`),
  - a batch DataFrame (just call the chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table

ENVELOPE_SCHEMA = (
    "key string, value string, topic string, partition int, offset long, "
    "ts timestamp, headers array<struct<key:string,value:binary>>"
)


def read_kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """Real Kafka source. Only the ``.format("kafka")`` boilerplate below is
    broker-dependent; the record decode is
    :func:`~kafka_custom_transforms_spark.streaming.kafka_wire.decode_wire`,
    unit- and oracle-tested broker-free over wire-shaped frames."""
    from kafka_custom_transforms_spark.streaming.kafka_wire import decode_wire

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("includeHeaders", "true")
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_wire(raw)


def events_envelope(events: DataFrame) -> DataFrame:
    """Shape the synthetic events table like a Kafka envelope: key = JSON of
    user_id, value = the schemaless props JSON, 8 synthetic partitions."""
    return events.select(
        F.to_json(F.struct("user_id")).alias("key"),
        F.col("props").alias("value"),
        F.lit("events").alias("topic"),
        (F.col("event_id") % 8).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts"),
        F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
    )


def stream_events_envelope(spark: SparkSession, parquet_dir: str) -> DataFrame:
    """File-backed streaming envelope over pre-staged events parquet — the
    test stand-in for the Kafka source (same columns, same code path)."""
    # The driver testdata stores TIMESTAMP(NANOS); read nanos as longs
    # (same repair as sources.tables.load_table, which this must not depend
    # on having run first).
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(parquet_dir)
    stream = spark.readStream.schema(batch.schema).parquet(parquet_dir)
    return events_envelope(stream)
