"""Deterministic hash sampling: reproducible row subsets at any scale.

A training-data pipeline needs samples that are (a) stable across runs and
cluster layouts — `df.sample()` is seeded per-partition and changes with
repartitioning — and (b) consistent across engines, so an audit query in a
warehouse selects the same rows. Both come from hashing a key column:
``hash(key) mod den < num`` picks a fixed pseudo-random ``num/den`` slice
of the keyspace, row-by-row reproducible anywhere the hash matches.

The hash is the engine's md5-prefix family (functions/texthash.md5_hash56):
bit-identical in DuckDB as ``('0x' || substr(md5(key), 1, 14))::BIGINT``,
so the sample itself is oracle-checkable (query ``sample_docs_hash``). On a
production cluster where cross-engine parity is not needed, ``xxhash64`` is
~10x cheaper per row — same plan shape, swap the expression.

Scale: a pure map-side filter fused into the scan; no shuffle, no state,
stream-legal. Sampling BY KEY (e.g. user_id) rather than row id keeps all
rows of a sampled entity together — the standard holdout construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kafka_custom_transforms_spark.functions.texthash import md5_hash56

__all__ = ["hash_bucket", "hash_sample"]


def hash_bucket(key: Column, buckets: int) -> Column:
    """Deterministic bucket in [0, buckets) from the md5-prefix hash of
    ``key`` (cast to string first for non-string keys)."""
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    return F.pmod(md5_hash56(key.cast("string")), F.lit(buckets))


def hash_sample(
    df: DataFrame, key_col: str, num: int, den: int = 100
) -> DataFrame:
    """Keep rows whose key hashes into the first ``num`` of ``den`` buckets
    — a reproducible ``num/den`` sample of the keyspace. Complementary
    slices (e.g. train = buckets [0,95), holdout = [95,100)) are disjoint
    and exhaustive by construction."""
    if not 0 <= num <= den:
        raise ValueError(f"need 0 <= num <= den, got {num}/{den}")
    return df.filter(hash_bucket(F.col(key_col), den) < num)
