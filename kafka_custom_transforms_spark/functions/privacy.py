"""Privacy transforms for training-data pipelines: keyed pseudonymization.

Re-identification hygiene that PRESERVES joinability: every occurrence of
an identifier maps to the same opaque token (salted hash), so sessions,
joins, and per-user aggregates still line up across tables — but the raw
id never leaves the pipeline, and rotating the salt unlinks releases from
each other. Complements text.pii_redact (free-text scrubbing): this is
the structured-column side.

Design: md5(salt || ':' || value) truncated to 15 hex chars (60 bits).
Pure codegen expressions, zero shuffle; the same arithmetic is expressible
in any engine (the DuckDB oracle recomputes tokens bit-identically).
Collision odds at 60 bits: ~n^2 / 2^61 — negligible below billions of
distinct ids; widen to the full md5 hex for more.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pseudonymize"]


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str,
    suffix: str = "_pseudo",
    keep_original: bool = False,
) -> DataFrame:
    """Replace each column in ``cols`` with its salted-hash token (named
    ``<col><suffix>``). Same (salt, value) -> same token everywhere, so
    cross-table joins keep working on the tokenized columns; different
    salts produce unlinkable tokens. ``keep_original=True`` retains the
    raw column alongside (for the trusted side of a split pipeline)."""
    out = df
    for c in cols:
        token = F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(c).cast("string"))), 1, 15
        )
        out = out.withColumn(c + suffix, token)
        if not keep_original:
            out = out.drop(c)
    return out
