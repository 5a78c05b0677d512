"""Sequence packing: greedy first-fit of tokenized docs into fixed-length
training sequences.

The reference SMT library has no batch/training concepts (SURVEY.md §2.4);
this is an engine-surface extension operator.  LLM pre-training consumes
fixed-length token sequences; packing multiple short documents into one
context window (instead of padding each to full length) is the standard
throughput lever — the packing DECISION (which doc goes to which sequence,
at which offset) is the data-engine part, and that is what this operator
computes.  Token concatenation itself belongs to the tokenizer/loader.

Scale design (100 TB):

Globally-sequential greedy packing is inherently serial, so we shard first:
``bucket = pmod(xxhash64(id), n_buckets)`` splits the corpus into
independent shards, and each shard is packed sequentially by one task via
``applyInPandas`` — ONE shuffle on the bucket key, then embarrassingly
parallel Arrow-batched packing.  ``n_buckets`` is the parallelism knob;
per-bucket state is two integers, so memory per task is the Arrow batch,
not the corpus.  Waste (unfilled tail per bucket) is <= one context window
per bucket — negligible for any realistic n_buckets.

Determinism: hash bucketing + id-ordered greedy within each bucket makes
the full assignment a pure function of (ids, token counts, context_len,
n_buckets) — the same definition a DuckDB recursive CTE recomputes in the
oracle, and reproducible across runs, partitionings, and engines.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["greedy_pack", "pack_sequences", "packed_text"]


def greedy_pack(
    pdf: pd.DataFrame, id_col: str, tokens_col: str, ctx: int
) -> pd.DataFrame:
    """Pure single-bucket greedy first-fit (id-ordered). Factored out of
    the Arrow UDF so property tests can hammer the packing invariants
    without a Spark job per example."""
    pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    seqs, offs = [], []
    seq, fill = -1, 0
    for n in pdf[tokens_col]:
        n = int(n)
        if seq >= 0 and fill + n <= ctx:
            offs.append(fill)
            fill += n
        else:
            seq += 1
            offs.append(0)
            fill = n
        seqs.append(seq)
    pdf["seq"] = pd.Series(seqs, dtype="int64")
    pdf["pack_offset"] = pd.Series(offs, dtype="int64")
    return pdf[[id_col, tokens_col, "bucket", "seq", "pack_offset"]]


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    context_len: int = 2048,
    n_buckets: int = 32,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """Assign each doc a ``(bucket, seq, pack_offset)`` packing slot.

    Within a bucket, docs are taken in ascending ``id_col`` order and
    packed first-fit: a doc joins the current sequence iff it fits in the
    remaining window, else it starts the next sequence.  A doc longer than
    ``context_len`` gets a sequence of its own (truncation is the
    tokenizer's call, not the packer's).  ``pack_offset`` is the doc's
    token start position inside its sequence.

    ``bucket_hash``: ``"xxhash64"`` (default — cheapest per row on a
    cluster) or ``"md5"`` (the engine's md5-prefix family, bit-identical
    in DuckDB, making the whole assignment oracle-checkable; same plan
    shape — see functions/sampling.py for the same trade).
    """
    if context_len <= 0:
        raise ValueError("pack_sequences: context_len must be positive")
    if bucket_hash == "xxhash64":
        bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    elif bucket_hash == "md5":
        from kafka_custom_transforms_spark.functions.sampling import hash_bucket

        bucket = hash_bucket(F.col(id_col), n_buckets)
    else:
        raise ValueError(f"bucket_hash must be xxhash64|md5, got {bucket_hash!r}")
    id_type = dict(df.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, {tokens_col} bigint, bucket int, "
        "seq bigint, pack_offset bigint"
    )
    ctx = int(context_len)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        return greedy_pack(pdf, id_col, tokens_col, ctx)

    with_bucket = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        bucket.cast("int").alias("bucket"),
    )
    return with_bucket.groupBy("bucket").applyInPandas(_pack, out_schema)


def packed_text(
    docs: DataFrame,
    assignment: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Materialize each packed sequence's text: join docs to their
    ``pack_sequences`` slots and concatenate per ``(bucket, seq)`` in
    pack_offset order.

    This is the loader-side consumer of the packing decision, expressed as
    one equi-join plus one groupBy — both shuffles on uniform hash keys
    (bucket cardinality is the parallelism floor, so pick n_buckets >=
    target parallelism upstream). Ordering inside a window is total
    because pack_offset is strictly increasing within a sequence.
    """
    joined = docs.select(id_col, text_col).join(assignment, id_col)
    return (
        joined.groupBy("bucket", "seq")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pack_offset", F.col(text_col)))
                    ),
                    lambda s: s[text_col],
                ),
                sep,
            ).alias("packed_text"),
            F.count("*").cast("long").alias("n_docs"),
            # tokens_col must match the name used in pack_sequences —
            # a parameterized upstream (tokens_col='tok_count') would
            # otherwise fail UNRESOLVED_COLUMN here
            F.sum(tokens_col).alias(tokens_col),
        )
    )
