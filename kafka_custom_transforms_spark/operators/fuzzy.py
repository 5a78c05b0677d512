"""Approximate string matching: edit-distance joins with candidate
blocking — entity resolution / record linkage over dirty ids and names.

The naive form is a cartesian product with a levenshtein filter — O(n*m)
comparisons, never acceptable at scale. The standard fix is BLOCKING:
join only within cheap equi-keys that true matches must share, then apply
the exact distance filter to the (small) candidate set. Each block family
trades recall for candidate count; the default here (string length within
±max_dist, via a shared length bucket) is LOSSLESS for edit distance —
|len(a) - len(b)| <= dist(a, b) always — while prefix blocking is lossy
(documented) but far more selective for long strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["fuzzy_join"]


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    block: str = "length",
    prefix_len: int = 3,
) -> DataFrame:
    """Pairs of rows whose strings are within ``max_dist`` edits, found via
    a blocked equi-join + exact ``levenshtein`` verify (identical metric in
    the DuckDB oracle).

    ``block="length"``: candidates are pairs whose length buckets can
    contain a true match (each left row joins its own bucket and the
    ±max_dist neighbors via explode — lossless, since edit distance
    changes length by at most its value). ``block="prefix"``: equi-join on
    the first ``prefix_len`` chars — much more selective, but misses pairs
    whose edits touch the prefix (recall caveat; the classic production
    compromise is to union several block families).

    Scale: candidate counts are (bucket size)^2 per key — both families
    produce uniform short keys; the exact verify runs only on candidates.
    Output keeps both sides' columns plus ``dist``.
    """
    # internal copies of the match columns: with left_col == right_col
    # (the natural record-linkage shape, e.g. 'name' vs 'name') the
    # unqualified post-join references would be AMBIGUOUS_REFERENCE.
    # NOTE: OTHER same-named payload columns still collide after the
    # join, as with DataFrame.join itself — alias/rename them first.
    lm, rm = "_fz_ls", "_fz_rs"
    lc = left.withColumn(lm, F.col(left_col))
    rc = right.withColumn(rm, F.col(right_col))
    if block == "length":
        l2 = lc.withColumn(
            "_fz_b",
            F.explode(
                F.array(
                    *[
                        F.length(F.col(lm)) + F.lit(d)
                        for d in range(-max_dist, max_dist + 1)
                    ]
                )
            ),
        )
        r2 = rc.withColumn("_fz_b", F.length(F.col(rm)))
    elif block == "prefix":
        l2 = lc.withColumn("_fz_b", F.substring(F.col(lm), 1, prefix_len))
        r2 = rc.withColumn("_fz_b", F.substring(F.col(rm), 1, prefix_len))
    else:
        raise ValueError(f"unknown block family: {block!r}")
    dist = F.levenshtein(F.col(lm), F.col(rm))
    return (
        l2.join(r2, "_fz_b")
        .filter(dist <= max_dist)
        .withColumn("dist", dist.cast("long"))
        .drop("_fz_b", lm, rm)
    )
