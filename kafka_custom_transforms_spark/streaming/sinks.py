"""Streaming sinks: the write side of the envelope pipeline.

The reference never writes anywhere (the Connect worker owns sinks); these
helpers complete the engine's source->transform->sink story on Spark's own
sink surface. All sinks are exactly-once-per-sink-semantics as provided by
Structured Streaming checkpointing (file sinks: exactly-once; Kafka:
at-least-once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_parquet_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
    partition_by: tuple[str, ...] = (),
) -> StreamingQuery:
    """Append-mode parquet sink with checkpointed exactly-once semantics.
    Partition by low-cardinality columns only (topic, date) — per-partition
    small files are the classic 100 TB sink mistake."""
    w = df.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
) -> StreamingQuery:
    """Kafka sink. The envelope->binary encode is
    :func:`~kafka_custom_transforms_spark.streaming.kafka_wire.encode_wire`
    (unit- and oracle-tested broker-free); only the ``.format("kafka")``
    boilerplate below needs a broker.

    Headers ride the record through the whole pipeline when present —
    reference parity: every SMT's newRecord forwards record.headers()
    (ExtendedHoistField.java:192-194), so dropping them at the sink would
    lose what the transform chain preserved."""
    from kafka_custom_transforms_spark.streaming.kafka_wire import encode_wire

    carried = [c for c in ("key", "value", "headers") if c in df.columns]
    out = encode_wire(df.select(*carried), topic=None)
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def write_foreach_batch(
    df: DataFrame,
    batch_fn,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch escape hatch: run arbitrary batch logic (merge/upsert,
    multi-sink fan-out) per micro-batch with the batch id for idempotence."""
    w = df.writeStream.foreachBatch(batch_fn).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
