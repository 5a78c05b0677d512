"""Table-maintenance operations: small-file compaction and surgical
partition replacement.

The two jobs every long-lived 100 TB table needs and every streaming
ingester creates the need for: micro-batches write many small files (each
file = one task = one scheduler slot at read time — a million 1 MB files
is a planning disaster), and late/corrected data requires replacing ONE
day's partition without touching the other 10,000 days.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

__all__ = ["compact_to_target", "overwrite_partitions"]


def compact_to_target(
    df: DataFrame,
    path: str,
    target_rows_per_file: int,
    mode: str = "overwrite",
) -> int:
    """Rewrite ``df`` as ``ceil(n / target_rows_per_file)`` parquet files
    and return that file count. Uses ``repartition(n_files)`` (round-robin
    — even file sizes) so downstream scans get uniformly sized splits;
    callers wanting data-clustered files should pre-sort and use
    ``repartitionByRange`` + ``sortWithinPartitions`` (see
    functions/layout.z_value for the two-dimensional case) — compaction
    preserves whatever order each partition holds.

    The count() pass is one extra scan of the input; at compaction scale
    the write dominates. For exactly-once maintenance jobs run the write
    under a fresh output directory + atomic rename (the pattern the
    streaming file sink uses)."""
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    df.repartition(n_files).write.mode(mode).parquet(path)
    return n_files


def overwrite_partitions(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_col: str,
) -> None:
    """INSERT OVERWRITE semantics for a Hive-layout parquet table with
    ``spark.sql.sources.partitionOverwriteMode=dynamic``: only the
    partitions present in ``df`` are replaced; every other partition's
    files are untouched (static mode — the default — would truncate the
    whole table). The conf is set/restored around the write."""
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set(key, old)
