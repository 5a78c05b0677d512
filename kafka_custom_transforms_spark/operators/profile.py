"""Column profiling: per-column null/distinct/min/max statistics in ONE
pass — the data-quality audit step every ingestion pipeline runs before
training-data jobs trust a new source drop.

No reference counterpart (SURVEY.md §2.4); driver-mandated extension
surface. Output is long-form (one row per column) so downstream checks can
join/diff profiles across snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["column_profile"]


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_null, n_distinct,
    min_str, max_str). min/max are computed on the NATIVE type (string
    comparison would order '10' < '9') and cast to string afterwards for a
    uniform long-form schema.

    Plan shape: a single aggregate pass over the table computes every
    column's stats at once (the multi-count_distinct expands rows k-ways
    map-side, then one shuffle of tiny partial states); the wide 1-row
    result is unpivoted to long form driver-free with explode over structs.
    At 100 TB this is one scan — never k scans of the table.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col("__n_rows").alias("n_rows"),
                    F.col(f"{c}__nulls").alias("n_null"),
                    F.col(f"{c}__distinct").alias("n_distinct"),
                    F.col(f"{c}__min").alias("min_str"),
                    F.col(f"{c}__max").alias("max_str"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return wide.select(rows).select(
        "p.col_name",
        F.col("p.n_rows").cast("long").alias("n_rows"),
        F.col("p.n_null").cast("long").alias("n_null"),
        F.col("p.n_distinct").cast("long").alias("n_distinct"),
        "p.min_str",
        "p.max_str",
    )
