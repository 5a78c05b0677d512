"""Event-time windowed aggregation with late-data handling.

The canonical Structured Streaming shape: watermark bounds both state size
and how late a record may arrive; tumbling/sliding windows aggregate
event-time buckets. The same function works on batch DataFrames (the
watermark is a no-op there), so oracles and backfills share the code path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def windowed_counts(
    df: DataFrame,
    keys: Sequence[str] = (),
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) event-time counts per key.

    Output: (window_start, window_end as epoch micros, keys..., n). On a
    stream the watermark drops data later than ``watermark_delay`` and lets
    the store evict closed windows — state is O(open windows x keys), not
    O(stream length).
    """
    src = df.withWatermark(ts_col, watermark_delay) if df.isStreaming else df
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        src.groupBy(win.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            *keys,
            "n",
        )
    )
