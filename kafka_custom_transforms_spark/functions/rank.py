"""Distributed global ranking without a single-task window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is the classic
100 TB trap: Spark funnels the entire table through ONE task. This module
computes the identical dense 1..N global rank with bounded per-task work:

  1. ``repartitionByRange`` on the order keys (range partitioner samples
     the data, so skew is spread across partitions);
  2. ``sortWithinPartitions`` — each partition sorts locally in parallel;
  3. per-partition row counts (a tiny #partitions-row aggregate collected
     to the driver) become cumulative offsets;
  4. a ``mapInPandas`` pass adds offset[pid] + a running local index —
     Arrow-batched, state is one integer per task.

Total cost: one range shuffle + one tiny count job — vs the single-task
global window whose one executor must hold and sort everything.

Determinism contract: the caller's order keys must be a TOTAL order
(include a unique tiebreaker column); equal keys land in the same range
partition, but their intra-rank order would otherwise be partition-layout
dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["global_rank", "ntile_from_rank"]


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``rank_col`` = the 1-based global row number of each row under
    ``order_by`` (must be a total order — include a unique tiebreaker).
    Scales: no single-task sort; see module docstring for the plan.
    """
    sc_conf = df.sparkSession.conf
    parts = num_partitions or int(sc_conf.get("spark.sql.shuffle.partitions", "200"))
    ordered = (
        df.repartitionByRange(parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_gr_pid", F.spark_partition_id())
    )
    # MUST materialize before the two downstream jobs: RangePartitioner's
    # sample seed derives from the (per-action) RDD id, so re-executing
    # the exchange for the count job and again for the mapInPandas job
    # can draw DIFFERENT range boundaries when sampling is partial —
    # offsets would then disagree with the rows actually in each
    # partition (ranks silently stop being a permutation). Pinning the
    # partitioning once makes both jobs read identical partitions.
    ordered = ordered.localCheckpoint(eager=True)
    counts = dict(
        (r["_gr_pid"], r["n"])
        for r in ordered.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = ordered.drop("_gr_pid").schema.add(rank_col, "long")
    names = [f.name for f in out_schema.fields]

    def add_rank(batches):
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_gr_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_gr_pid"])
            pdf[rank_col] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf[names]

    # mapInPandas preserves the within-partition row order of its input
    # (batches stream through in order), so the running index is the
    # partition-local row number.
    return ordered.mapInPandas(add_rank, out_schema)


def ntile_from_rank(rank: Column, n_rows: int, n_buckets: int) -> Column:
    """Exact SQL NTILE semantics from a precomputed global rank: the first
    ``n_rows % n_buckets`` buckets get ``ceil(n_rows / n_buckets)`` rows,
    the rest one fewer — bit-for-bit what ``ntile(n) OVER (ORDER BY ...)``
    produces, but computable map-side once ranks exist."""
    q, rem = divmod(n_rows, n_buckets)
    big = rem * (q + 1)
    if q == 0:
        # fewer rows than buckets: rank IS the bucket
        return rank.cast("long")
    return (
        F.when(rank <= big, F.ceil(rank / F.lit(q + 1)))
        .otherwise(rem + F.ceil((rank - big) / F.lit(q)))
        .cast("long")
    )
