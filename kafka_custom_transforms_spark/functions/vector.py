"""Vector math over ``array<float|double>`` columns as built-in expressions.

No UDFs: dot products and norms are ``zip_with`` + ``aggregate`` folds, which
stay inside whole-stage codegen. The fold is *sequential in array order*,
which makes results bit-reproducible — the DuckDB oracles replicate the same
left-fold so comparisons are exact, not tolerance-based.

Scale: these are per-row map-side expressions; the cost model is O(dim) per
pair with zero shuffle. Pair-generation strategy (broadcast, LSH buckets,
IVF cells) is the responsibility of the calling operator.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


import functools


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential left-fold dot product: ((a1*b1) + a2*b2) + ...

    With ``dim`` given, the sum is unrolled into a flat expression tree that
    whole-stage codegen compiles (higher-order-function lambdas never are —
    the interpreted path is 10-30x slower under JIT megamorphism). The
    unrolled left-association is bit-identical to the lambda fold and to the
    DuckDB oracle's list_reduce.
    """
    if dim is not None:
        terms = [
            F.element_at(a, i) * F.element_at(b, i) for i in range(1, dim + 1)
        ]
        return functools.reduce(lambda x, y: x + y, terms)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))
