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

__all__ = ["hash_bucket", "hash_sample", "mixture_sample"]


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


def mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates_pm: dict[str, int],
    default_pm: int = 1000,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the data-mixture reweighting
    step of a training pipeline (keep 30% of crawl, 100% of books, ...).

    ``rates_pm`` maps stratum value -> keep rate in per-mille (integers, so
    thresholds are exact in every engine — a float rate like 0.3 * 1000
    truncates to 299 in one engine and rounds to 300 in another); strata
    not listed keep ``default_pm``. Selection hashes ``key_col`` exactly
    like ``hash_sample``, so mixture slices are stable across runs,
    repartitionings, and engines, and coincide exactly with
    ``hash_sample(key, rate_pm, 1000)`` slices (same key, same
    denominator), so mixture cuts and holdout splits compose predictably.

    Scale: the rates dict becomes a plan-time map literal, the whole thing
    a map-side filter fused into the scan — zero shuffle, zero state, and
    stream-legal. Per-stratum rates are exact to 1/1000 of the keyspace.
    """
    for k, v in rates_pm.items():
        if not 0 <= v <= 1000:
            raise ValueError(f"rates_pm[{k!r}] must be in [0, 1000], got {v}")
    if not 0 <= default_pm <= 1000:
        raise ValueError(f"default_pm must be in [0, 1000], got {default_pm}")
    if rates_pm:
        pairs: list[Column] = []
        for k, v in rates_pm.items():
            pairs += [F.lit(k), F.lit(int(v))]
        thresh = F.coalesce(
            F.create_map(*pairs)[F.col(strata_col)], F.lit(int(default_pm))
        )
    else:
        thresh = F.lit(int(default_pm))
    return df.filter(
        F.pmod(md5_hash56(F.col(key_col).cast("string")), F.lit(1000)) < thresh
    )
