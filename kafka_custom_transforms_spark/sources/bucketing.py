"""Bucketed tables: pre-shuffled storage for co-located, exchange-free joins.

The biggest repeated cost in a 100 TB warehouse is re-shuffling the same
fact table on the same key for every join. Bucketing pays that shuffle ONCE
at write time: both sides stored bucketed (and sorted) on the join key with
the same bucket count let Spark plan a sort-merge join with NO Exchange on
either side — each task reads matching bucket files directly
(`spark.sql.sources.bucketing.enabled`, on by default). The
`bucketed_join_orders` query exercises this end-to-end and
tests/test_plans.py pins the exchange-free plan shape.

Local note: `saveAsTable` with an explicit `path` creates EXTERNAL tables in
the session catalog (in-memory Derby metastore here; Hive/Glue on a
cluster), so nothing is written outside the given directory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    path: str,
) -> None:
    """Write ``df`` as an external parquet table bucketed AND sorted on
    ``keys`` — sorted buckets let the sort-merge join skip its sort too."""
    keys = list(keys)
    (
        df.write.format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_equijoin(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    base_path: str,
    n_buckets: int = 8,
    table_prefix: str = "kcts_bucketed",
) -> DataFrame:
    """Materialize both inputs bucketed on their join keys, then join the
    bucketed tables with a merge-join hint. The write is the one-time
    shuffle; the returned join plan has NO Exchange (bucket-aligned scans).
    The hint forces sort-merge so a small side doesn't broadcast away the
    demonstration; drop it in production and let Catalyst choose."""
    lt, rt = f"{table_prefix}_l", f"{table_prefix}_r"
    write_bucketed_table(left, lt, [left_key], n_buckets, f"{base_path}/{lt}")
    write_bucketed_table(right, rt, [right_key], n_buckets, f"{base_path}/{rt}")
    ldf = spark.table(lt)
    rdf = spark.table(rt)
    return ldf.hint("merge").join(rdf, ldf[left_key] == rdf[right_key])
