"""Parquet table loading for the driver's synthetic testdata.

Timestamp repair, handling BOTH generations of the driver testdata:

  - TIMESTAMP(NANOS) columns (rounds 1-2), which Spark 4's reader rejects
    by default (PARQUET_TYPE_ILLEGAL): flip the runtime conf
    ``spark.sql.legacy.parquet.nanosAsLong`` (reads them as nanosecond
    longs) and convert back with ``timestamp_micros`` — verified lossless,
    the generated data has zero sub-microsecond precision.
  - TIMESTAMP(MICROS, isAdjustedToUTC=false) columns (round-3 testdata),
    which Spark reads as TIMESTAMP_NTZ: cast to the session-local TIMESTAMP
    type so ``unix_micros`` / ``window`` / watermarks work. The session
    timezone is pinned to UTC (session.py / tests/conftest.py), making the
    cast a type-tag change on identical micros values — bit-parity with the
    DuckDB oracle's naive-timestamp ``epoch_us`` reading of the same file.

Scale note: the conversion is a map-side projection fused into the scan stage
by whole-stage codegen; filter pushdown and column pruning on the remaining
columns are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

# Timestamp columns per table (stored as TIMESTAMP(NANOS) in the parquet).
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Schema cache for repeated reads of the same parquet path (r15
# optimization, guide §6 driver-side metadata): ``spark.read.parquet``
# re-reads the footer for schema inference on EVERY call — measured
# ~0.1 s of driver time per call at sf0.1, paid once per table per query
# build (a 4-table join pays ~0.4 s before any task runs). Caching the
# inferred StructType and passing it back via ``.schema(...)`` cuts the
# repeat cost to ~0.02 s. METADATA only — no rows, no results, and the
# key carries the file set's (mtime_ns, size) fingerprint so a rewritten
# path (tests regenerate temp tables) never serves a stale schema. At
# cluster scale this is the same move as catalog-managed schemas: never
# infer twice what is already known.
_SCHEMA_CACHE: dict[tuple, object] = {}


def _path_fingerprint(path: str) -> tuple | None:
    """(mtime_ns, size) over the file or directory listing; None when
    unreadable (caller then skips the cache)."""
    import os

    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return (st.st_mtime_ns, st.st_size)
        parts = []
        for entry in sorted(os.listdir(path)):
            est = os.stat(os.path.join(path, entry))
            parts.append((entry, est.st_mtime_ns, est.st_size))
        return tuple(parts)
    except OSError:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet`` with nanos-timestamp repair.

    Session-wide side effect (documented, not scoped): the returned
    DataFrame is lazy and the parquet reader consults
    ``spark.sql.legacy.parquet.nanosAsLong`` again at execution time, so a
    save/restore around the read would break the very plan we return. The
    conf is therefore left on for the session; :func:`..session.get_spark`
    sets it at construction so this is normally a no-op here.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    fp = _path_fingerprint(path)
    key = (path, fp)
    if fp is not None and key in _SCHEMA_CACHE:
        df = spark.read.schema(_SCHEMA_CACHE[key]).parquet(path)
    else:
        df = spark.read.parquet(path)
        if fp is not None:
            _SCHEMA_CACHE[key] = df.schema
    for c in _TS_COLS.get(name, ()):
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            # integer division: the nanos values exceed double's 53-bit
            # exact-integer range, so `/ 1000` would be off by up to 1 us
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, TimestampNTZType):
            # TIMESTAMP(MICROS) testdata: NTZ -> session-local timestamp
            # (UTC session, so the micros value is unchanged)
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
