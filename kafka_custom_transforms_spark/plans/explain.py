"""Physical-plan assertions for scale hygiene.

"Would this plan survive a 100x scale-up?" is checkable: filters must reach
the parquet scan, small sides must broadcast, scans must prune columns.
These helpers read the executed/formatted plan string so tests can pin the
plan shape, not just the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(  # noqa: SLF001 - no public API
        getattr(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode,  # noqa: SLF001
            "fromString",
        )(mode)
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan advertises a pushed filter containing
    ``fragment`` (explain shows PushedFilters: [...])."""
    plan = plan_str(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (ReadSchema lines) —
    a 2-column projection reading 16 columns means pruning failed."""
    plan = plan_str(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(p.split(":")[0].strip() for p in inner.split(",") if ":" in p)
    return cols


def broadcast_join_count(df: DataFrame) -> int:
    plan = plan_str(df)
    return plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")


def shuffle_count(df: DataFrame) -> int:
    return plan_str(df).count("Exchange")
