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


def upsert_parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    order_col: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Keyed MERGE/upsert sink on plain parquet (no lakehouse format):
    each micro-batch is unioned with the current table and collapsed to
    the latest row per key (max ``order_col``; for a deterministic
    survivor ``order_col`` must be unique per key — event ids and CDC
    LSNs are), then the table is atomically swapped
    (write to a versioned directory, flip a pointer file — readers using
    the pointer never see a partial write).

    Idempotence: re-running a batch after a crash re-applies the same
    latest-per-key reduction — convergent by construction, the property
    MERGE needs under Structured Streaming's at-least-once foreachBatch
    contract.

    Scale: the rewrite cost is the current table size per batch — the
    plain-parquet trade. At 100 TB you partition ``path`` by a key prefix
    and rewrite only partitions present in the batch
    (sources/maintenance.overwrite_partitions), or move to a format with
    row-level merge; the per-batch logic here is unchanged. The pointer
    file uses POSIX rename atomicity — on object stores swap it for any
    atomic single-key put (S3 PUT of the pointer object) or a metastore
    table-location update; the versioned-directory layout is what makes
    the swap a one-key operation.
    """
    import os

    from pyspark.sql import Window, functions as F

    spark_ref = df.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        ptr = os.path.join(path, "LATEST")
        current, cur_dir = None, None
        if os.path.exists(ptr):
            with open(ptr) as f:
                cur_dir = f.read().strip()
            current = spark_ref.read.parquet(cur_dir)
        merged = batch_df if current is None else current.unionByName(batch_df)
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # Crash-replay guard: if the previous attempt flipped the pointer
        # but the micro-batch never committed, the pointer ALREADY names
        # v{batch_id}; writing there again would overwrite the directory
        # the lazy merge plan is reading from (read-overwrite-same-path).
        # A retry-suffixed directory keeps every write target fresh while
        # replays stay convergent (same reduction, new dir, same flip).
        new_dir = os.path.join(path, f"v{batch_id}")
        retry = 0
        while new_dir == cur_dir or os.path.exists(new_dir):
            retry += 1
            new_dir = os.path.join(path, f"v{batch_id}r{retry}")
        latest.write.mode("overwrite").parquet(new_dir)
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(new_dir)
        os.replace(tmp, ptr)  # atomic pointer flip

    return write_foreach_batch(
        df, merge_batch, checkpoint, trigger_available_now=trigger_available_now
    )


def read_upsert_table(spark, path: str) -> DataFrame:
    """Read the current version of an :func:`upsert_parquet_sink` table via
    its pointer file."""
    import os

    with open(os.path.join(path, "LATEST")) as f:
        return spark.read.parquet(f.read().strip())


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
