"""Physical-layout expressions: Z-order (Morton) interleaving for
multi-dimensional data clustering.

Why it matters at 100 TB: parquet scan pruning works off per-file min/max
column statistics. Sorting by one key clusters that key only; writing files
ordered by the Z-value of (key_a, key_b) keeps BOTH dimensions locally
dense, so range predicates on either column skip most files. This is the
same technique Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is a
plain deterministic bigint expression, so any writer can
``repartitionByRange(z).sortWithinPartitions(z)`` before a parquet write.

Pure bit arithmetic (shift/and/or as additions of disjoint powers of two) —
bit-identical in a DuckDB oracle, and mod-bounded so ANSI-mode bigint
overflow checking never fires (2 * bits <= 62).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["z_value"]


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low ``bits`` bits of two
    non-negative bigint expressions: bit i of ``a`` lands at position 2i,
    bit i of ``b`` at 2i+1. Inputs are masked to ``bits`` bits (callers
    hash or bucket wider domains first). 2*bits must stay <= 62 so the
    result is a positive bigint under ANSI mode.

    The summed-shifts form (each term a distinct power of two, so ``+`` is
    exactly bitwise OR) keeps the whole expression inside whole-stage
    codegen — no UDF, no Python.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out
