"""Single source of truth for the correctness-gate comparison semantics.

The driver's gate compares Spark output against the DuckDB oracle by
column names, row count, and exact cell values (order-insensitive; floats
via repr so bit-identical doubles compare equal). Two consumers replicate
that comparison — ``tests/test_oracle_parity.py`` (sf0.001 pytest flavor)
and ``tools/parity_sweep.py`` (the sf0.01 standalone replica; staged-row
test modules for future rounds import it too) — and previously
each carried its own copy of the normalizer, so a change to one could
silently diverge from the others. They all import THIS module now.
"""

from __future__ import annotations

import math

import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical order-insensitive string form of a result frame: columns
    sorted by name, one canonical string per cell (exact for ints/strings;
    floats use repr — bit-identical floats produce identical reprs; NULL
    and NaN collapse to one marker), rows sorted stably."""
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )
