"""DSIR-style importance scoring: content-based data targeting.

Data Selection via Importance Resampling (Xie et al., 2023, public) selects
pretraining documents whose hashed n-gram feature distribution looks like a
target corpus: per-document importance weight ~ prod p_target(f)/p_raw(f)
over the document's features. This module implements the
frequency-ratio form with EXACT integer arithmetic so the score is
order-independent and cross-engine reproducible (no float log sums, whose
value depends on reduction order):

    bucket(g)     = md5_60(g) mod n_buckets      (engine-exact hash)
    ratio_milli(b) = (ct[b] * scale * Nr) div (cr[b] * Nt)
    score_milli(d) = sum over d's distinct grams of ratio_milli(bucket)

ct/cr are bucket occurrence counts over the target/raw gram streams, Nt/Nr
their totals; ratio_milli is the per-mille likelihood ratio (log-free:
monotone in the true ratio per bucket, which is what selection needs).

Scale design: one explode+groupBy pass builds the bucket table
(<= n_buckets rows — CONSTANT in corpus size, like the Bloom filter);
it broadcasts to the per-doc scoring join, so the corpus shuffles once
(per-doc sum on doc_id). At 100 TB the integer products need headroom:
ct*scale*Nr < 2^63 bounds the gram stream to ~3e6 per 1000-scale — beyond
that move the two products to decimal(38,0) (same floor-division
semantics); the structure is unchanged.

No reference counterpart (driver-mandated extension class; the reference
is 3 Kafka SMTs — see SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kafka_custom_transforms_spark.functions.texthash import (
    md5_hash60,
    tokens,
    word_shingles,
)


def _doc_grams(
    docs: DataFrame, text_col: str, id_col: str, ngram: int, n_buckets: int
) -> DataFrame:
    """(id, bucket) per n-gram per document, via explode_OUTER: a document
    with no grams (short/empty/null text) survives as one null-bucket row
    (md5 of null is null, so the bucket stays null). Keeping gram-less
    docs in the stream lets the scorer aggregate straight to the final
    per-doc row — the r15 plan audit showed the old explode form needed a
    corpus-wide LEFT OUTER join (docs ids vs per-doc sums = an extra
    Exchange + two Sorts + a third corpus scan) purely to resurrect
    them."""
    g = F.explode_outer(word_shingles(tokens(F.col(text_col)), ngram)).alias("gram")
    return docs.select(F.col(id_col).alias("_imp_id"), g).select(
        "_imp_id", F.pmod(md5_hash60(F.col("gram")), F.lit(n_buckets)).alias("bucket")
    )


def bucket_ratio_table(
    docs: DataFrame,
    target_cond,
    text_col: str = "text",
    ngram: int = 2,
    n_buckets: int = 4096,
    scale: int = 1000,
) -> DataFrame:
    """Per-bucket integer importance ratios: (bucket, ratio_milli).

    <= ``n_buckets`` rows regardless of corpus size — always
    broadcastable. ``target_cond`` is a boolean Column marking target
    documents (they stay part of raw: DSIR's raw distribution is the
    full corpus)."""
    exploded = docs.select(
        target_cond.alias("_t"),
        F.explode(word_shingles(tokens(F.col(text_col)), ngram)).alias("gram"),
    ).select("_t", F.pmod(md5_hash60(F.col("gram")), F.lit(n_buckets)).alias("bucket"))
    counts = exploded.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("ct"),
    )
    totals = counts.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    # nt = 0 (no target documents, or a gram-less target) would be an ANSI
    # division-by-zero at runtime; an empty target means "nothing is
    # representative", so every ratio is 0 and nothing selects.
    # The products run in decimal(38,0), not bigint: ct * scale * nr
    # overflows int64 once the corpus holds ~3e6 total grams (ANSI mode
    # would throw ARITHMETIC_OVERFLOW; ANSI off would silently wrap).
    # decimal(38,0) holds ~1e13 grams * 1e3 * 1e13 = 1e29 with room to
    # spare; `div` (IntegralDivide) accepts decimals and still returns
    # bigint, so floor-division semantics and the output type are
    # unchanged (test-pinned against the bigint form on small inputs).
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.expr(
            f"case when nt = 0 then 0L "
            f"else cast(ct as decimal(38,0)) * {scale} * nr "
            f"div (cast(cr as decimal(38,0)) * nt) end"
        ).cast("long").alias("ratio_milli"),
    )


def importance_scores(
    docs: DataFrame,
    target_cond,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 2,
    n_buckets: int = 4096,
    scale: int = 1000,
) -> DataFrame:
    """Per-document integer importance: (id_col, n_grams, score_milli,
    selected). ``selected`` keeps documents whose average per-gram ratio
    is >= 1 (score >= n_grams * scale) — gram-less documents score 0 and
    are not selected. Integer sums make the score independent of
    partitioning and join order."""
    ratios = bucket_ratio_table(docs, target_cond, text_col, ngram, n_buckets, scale)
    grams = _doc_grams(docs, text_col, id_col, ngram, n_buckets)
    # LEFT join + count("bucket"): every real gram's bucket exists in the
    # ratio table by construction (both derive from the same corpus), so
    # the left join matches exactly the rows the old inner join did; the
    # only unmatched rows are the null-bucket markers of gram-less docs,
    # which count() over "bucket" ignores (n_grams 0) and sum() leaves
    # NULL (coalesced to 0). One doc_id-keyed exchange total — the old
    # docs-LEFT-OUTER-per_doc resurrection join (corpus-wide SMJ) is gone.
    # Assumes id_col is unique per document, as every caller's corpus is
    # (the old join form duplicated OUTPUT rows on duplicate ids instead
    # of merging them — neither form is meaningful on duplicate ids).
    per_doc = (
        grams.join(F.broadcast(ratios), "bucket", "left")
        .groupBy("_imp_id")
        .agg(
            F.count(F.col("bucket")).alias("n_grams"),
            F.sum("ratio_milli").alias("score_milli"),
        )
    )
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0)).cast("long")
    score = F.coalesce(F.col("score_milli"), F.lit(0)).cast("long")
    return per_doc.select(
        F.col("_imp_id").alias(id_col),
        n_grams.alias("n_grams"),
        score.alias("score_milli"),
        ((score >= n_grams * scale) & (n_grams > 0)).alias("selected"),
    )
