"""Text-analysis operators over a documents table.

All integer-only (or md5-string) outputs so DuckDB oracles hash-match
exactly: ratios are expressed as scaled integer divisions, never raw double
division. Every function is pure Catalyst expressions — zero Python in the
row path, zero shuffles except where a rollup explicitly aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from kafka_custom_transforms_spark.functions.texthash import tokens, word_shingles

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Real pipelines plug in fastText/CLD3-class models via a pandas
# UDF; the heuristic is the dependency-free, SQL-oracle-checkable baseline.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "las", "es", "y", "que", "un"),
    "fr": ("le", "la", "les", "est", "et", "que", "une", "dans"),
    "zh": (),  # detected by script, not stopwords
}


def token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token statistics (all bigint)."""
    t = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_uniq_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.array_max(F.transform(t, F.length)).cast("long").alias("max_token_len"),
    )


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID: CJK script check, then stopword-hit argmax with
    deterministic tie-break (lexicographic lang order wins), 'und' if no
    marker hits. Pure map-side expression."""
    t = tokens(F.col(text_col))
    scores = {
        lang: F.size(F.array_intersect(t, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
        if words
    }
    has_cjk = F.col(text_col).rlike("[\\u4e00-\\u9fff]")
    ordered = sorted(scores)  # deterministic tie-break: first lang in order
    # fold right-to-left so earlier langs win ties
    detected = F.lit("und")
    max_score = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    for lang in reversed(ordered):
        detected = F.when(
            (scores[lang] > 0) & (scores[lang] == max_score), F.lit(lang)
        ).otherwise(detected)
    detected = F.when(has_cjk, F.lit("zh")).otherwise(detected)
    return df.select(F.col(id_col), detected.alias("detected_lang"))


def quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Integer quality score 0..100 from length, lexical diversity, and mean
    token length — the classic cheap pre-filters for training-data curation.
    Ratio checks are expressed multiplication-only (``uniq*100 >= 30*n``
    instead of ``uniq/n >= 0.3``) so the DuckDB oracle is bit-exact:

      - length_ok   (40): 20 <= n_tokens <= 120
      - diversity   (30): unique-token ratio >= 30%
      - tok_len_ok  (30): mean token length in [2, 12]
    """
    t = tokens(F.col(text_col))
    n = F.size(t).cast("long")
    uniq = F.size(F.array_distinct(t)).cast("long")
    # total token chars = n_chars - (n_tokens - 1): text is single-space joined
    tok_chars = F.length(F.col(text_col)).cast("long") - (n - 1)
    score = (
        F.when((n >= 20) & (n <= 120), 40).otherwise(0)
        + F.when(uniq * 100 >= 30 * n, 30).otherwise(0)
        + F.when((tok_chars >= 2 * n) & (tok_chars <= 12 * n), 30).otherwise(0)
    )
    # carry_cols ride through for grouping downstream; only those actually
    # present are selected, so inputs without e.g. a 'lang' column work
    carried = [F.col(c) for c in carry_cols if c in df.columns]
    return df.select(
        F.col(id_col),
        *carried,
        score.cast("long").alias("quality"),
        n.alias("n_tokens"),
        uniq.alias("n_uniq_tokens"),
    )


def doc_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
) -> DataFrame:
    """Winnowing-style document fingerprint: md5 of every ``window``-token
    sliding window, keep the minimum digest. Robust to small edits away from
    the minimal window; md5 is bit-identical in the DuckDB oracle.
    Documents shorter than the window hash their full text."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    wins = F.transform(
        F.sequence(F.lit(1), n - window + 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(t, i, window))),
    )
    fp = F.when(n >= window, F.array_min(wins)).otherwise(F.md5(F.col(text_col)))
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, arXiv:2112.11446,
    Table A1): duplicate-line fraction, duplicate-line CHARACTER fraction,
    and top-bigram occurrence fraction — the standard "document is mostly
    boilerplate / repeated itself" filters for LLM training corpora.

    Per the module contract, fractions are per-mille bigints (integer
    division), so DuckDB oracles hash-match bit-exactly. ``repetitive``
    applies Gopher's published thresholds (dup-line > 30%, dup-line-chars
    > 20%, top-bigram > 18%).

    Scale: pure per-row Catalyst expressions — zero shuffle, linear scans
    over the corpus. Per-document cost is O(lines^2 + bigrams^2) from the
    nested membership scans, fine at web-document length (<= a few
    thousand lines); for book-length inputs use an explode + groupBy
    formulation (one shuffle) — the signal definitions are identical.
    """
    lines = F.split(F.col(text_col), "\n")
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    raw_bg = F.transform(
        F.sequence(F.lit(1), n_tok - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    # guard: sequence(1, 0) would be DESCENDING, not empty
    bigrams = F.when(n_tok >= 2, raw_bg).otherwise(F.array().cast("array<string>"))

    n_lines = F.size(lines)
    n_dist = F.size(F.array_distinct(lines))
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dup_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("long"),
        lambda acc, l: acc
        + F.when(
            F.size(F.filter(lines, lambda x: x == l)) > 1,
            F.size(F.filter(lines, lambda x: x == l)).cast("long") * F.length(l),
        ).otherwise(F.lit(0).cast("long")),
    )
    n_bg = F.size(bigrams)
    top_bg = F.when(
        n_bg > 0,
        F.array_max(
            F.transform(
                F.array_distinct(bigrams),
                lambda g: F.size(F.filter(bigrams, lambda x: x == g)),
            )
        ),
    ).otherwise(F.lit(0))

    dup_line_pm = (
        ((n_lines - n_dist).cast("long") * 1000) / n_lines.cast("long")
    ).cast("long")
    dup_char_pm = F.when(
        total_chars > 0, (dup_chars * 1000 / total_chars).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    top_bg_pm = F.when(
        n_bg > 0, (top_bg.cast("long") * 1000 / n_bg.cast("long")).cast("long")
    ).otherwise(F.lit(0).cast("long"))

    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        dup_line_pm.alias("dup_line_pm"),
        dup_char_pm.alias("dup_line_char_pm"),
        top_bg_pm.alias("top_bigram_pm"),
        (
            (dup_line_pm > 300) | (dup_char_pm > 200) | (top_bg_pm > 180)
        ).alias("repetitive"),
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    lines_col: str = "lines",
    out_col: str = "text_dedup",
    sep: str = " ",
) -> DataFrame:
    """Corpus-global line-level deduplication (the C4 / RefinedWeb hygiene
    pass: C4, arXiv:1910.10683 §2.2, deduplicates three-sentence spans
    corpus-wide; RefinedWeb, arXiv:2306.01116, drops repeated lines): every
    distinct line keeps exactly its FIRST occurrence across the whole corpus
    (ordered by (id, position)); later occurrences are removed from their
    documents. Documents are reassembled in original line order; a document
    whose every line was seen earlier comes back as ''.

    Input is an exploded-ready array column (``lines_col``) so the caller
    owns the segmentation policy (newlines, sentences, fixed token chunks).

    Plan shape (scale): posexplode_outer -> ONE shuffle hash-partitioned on
    the line text -> row_number window picks the survivor occurrence ->
    groupBy(id) reassembly (second shuffle, uniform on ids). EXACTLY two
    shuffles, no join: instead of filtering survivors and joining back to
    recover fully-deduplicated documents, the reassembly aggregates over
    ALL exploded rows and drops losers inside the agg
    (``collect_list(when(rnk = 1, ...))`` skips nulls), so every id —
    including empty documents, via the _outer explode — survives to the
    output with ''. Skew caveat: a pathologically common line (empty
    string, boilerplate header) concentrates one window partition;
    pre-filtering trivial lines (length < threshold) is the standard
    mitigation and stays caller-owned.
    """
    ex = df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(F.col(lines_col)).alias("pos", "line"),
    )
    w = Window.partitionBy("line").orderBy("id", "pos")
    ranked = ex.withColumn("rnk", F.row_number().over(w))
    return ranked.groupBy("id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("rnk") == 1, F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias(out_col)
    ).select(F.col("id").alias(id_col), F.col(out_col))


def token_rollup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus rollup: token volume per (lang, source) — partial (map-side)
    aggregation then a single shuffle on the grouping keys."""
    t = tokens(F.col(text_col))
    return (
        df.select("lang", "source", F.size(t).cast("long").alias("nt"), F.length(text_col).cast("long").alias("nc"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            F.sum("nc").alias("total_chars"),
        )
    )


# PII-ish patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): character classes + bounded quantifiers only — no
# backreferences, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "url": "https?://[^ \\t\\n]+",
    "long_number": "[0-9]{7,}",
}


def pattern_scan(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document counts of PII-ish pattern hits (email / url / long
    number) — the audit step before redaction in a training-data pipeline.
    Pure codegen regexp expressions, zero shuffle."""
    return df.select(
        F.col(id_col),
        *[
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(p), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
            for name, p in PII_PATTERNS.items()
        ],
    )


def pii_redact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sentinel: str = "[REDACTED]",
) -> DataFrame:
    """Replace every PII pattern hit with ``sentinel`` (all occurrences —
    Spark regexp_replace is global; the DuckDB oracle needs the 'g' flag).
    Map-side only; composes with any downstream operator."""
    out = F.col(text_col)
    for p in PII_PATTERNS.values():
        out = F.regexp_replace(out, p, sentinel)
    return df.select(F.col(id_col), out.alias("redacted"))


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    out_col: str = "normalized",
) -> DataFrame:
    """Canonical text form: lowercase, trimmed, internal whitespace runs
    collapsed to single spaces — the normalization every dedup/fingerprint
    pass should share so near-identical documents hash identically.
    Pure codegen expressions; DuckDB oracle is lower/trim/regexp_replace
    with the 'g' flag (Spark's regexp_replace is global by default)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), " +", " ")
    return df.select(F.col(id_col), norm.alias(out_col))


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Per-document top-k distinctive terms by tf-idf rank. The score is the
    INTEGER (tf * 1_000_000) / df (floor) — rank-equivalent to tf/df (and
    monotone in tf * idf for the ranking within a document), chosen over a
    float log-idf because engines' libm log implementations differ in the
    last bit while integer division is cross-engine exact. Ties break on
    token text.

    Plan: explode -> (doc, token) count shuffle -> token df count shuffle ->
    broadcast-friendly token-stats join -> per-doc top-k window. The df
    (document-frequency) side is one row per distinct token — at corpus
    scale that is the vocabulary, orders of magnitude smaller than the
    corpus; Spark broadcasts it when under the threshold."""
    toks = df.select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # floor of the double quotient equals integer division here: tf*1e6 is
    # exact in double (< 2^53) and a non-exact quotient sits >= 1/df above
    # the next integer — far outside double rounding error.
    scored = tf.join(dfreq, "tok").withColumn(
        "score", F.floor(F.col("tf") * F.lit(1_000_000) / F.col("df"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("id").alias(id_col),
            "tok",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("score").cast("long").alias("score"),
        )
    )


def lm_likelihood(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained bigram LM likelihood score — the CCNet-style
    quality signal: train MLE bigram probabilities on the corpus itself,
    then score every document by how predictable its token transitions
    are (low scores flag noise/boilerplate-free diverse text, high
    scores flag repetitive or templated content). Per-bigram probability
    is the exact per-mille integer ``(1000 * c(w1,w2)) div c(w1·)``
    where ``c(w1·)`` is the context count, so the score is deterministic
    under any partitioning and the DuckDB oracle reproduces it bit for
    bit — no floats, no log-space cross-engine drift.

    Scale design (100 TB): three data-sized shuffles — the per-doc
    bigram pre-aggregation (bounds hot-bigram multiplicity before
    anything wide), the count-table equi-join on the bigram key (M:1;
    AQE skew-join splits hot stopword bigrams), and the final per-doc
    sum. The context-count table is derived by re-aggregating the
    already-shrunk bigram count table, never the raw token stream. The
    count table joins (never broadcasts — vocab² can exceed any
    broadcast budget); ``c*1000`` stays inside int64 up to ~9e15
    bigram occurrences (~10 PB of text), far past the design point.
    """
    t = tokens(F.col(text_col))
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    doc_bg = df.select(
        F.col(id_col), F.explode(bigrams).alias("bg")
    ).groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("m"))
    bg_counts = doc_bg.groupBy("bg").agg(F.sum("m").alias("c_bg"))
    ctx_counts = (
        bg_counts.withColumn("w1", F.split(F.col("bg"), " ")[0])
        .groupBy("w1")
        .agg(F.sum("c_bg").alias("c_ctx"))
    )
    enriched = bg_counts.withColumn(
        "w1", F.split(F.col("bg"), " ")[0]
    ).join(ctx_counts, "w1")
    scored = (
        doc_bg.join(enriched, "bg")
        .groupBy(id_col)
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.sum(
                F.col("m") * F.expr("(c_bg * 1000L) div c_ctx")
            ).alias("lm_sum_pm"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("lm_sum_pm", F.lit(0)).cast("long").alias("lm_sum_pm"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.expr("(lm_sum_pm * 1000L) div n_bigrams"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lm_avg_micro"),
        )
    )


def phrase_search(
    df: DataFrame,
    phrase: str | list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Exact n-term phrase search over an inverted index: posexplode the
    corpus into (id, pos, word) postings, filter one posting list per
    phrase term, and chain adjacency EQUI joins — term i joins on
    ``(id, p0 + i)``, so the position arithmetic is a JOIN KEY (plan-
    pinned: no nested-loop fallback), and every join co-partitions on the
    document id. Returns per-document ``n_hits`` (phrase occurrences) and
    ``first_pos`` (position of the earliest occurrence's first term).

    Generalization of the registry row ``phrase_index_docs`` (which calls
    this with the same two terms it always pinned, keeping its plan
    shape); reference parity note: the reference SMT library has no query
    surface (SURVEY §2.4) — this is part of the mandated text-analysis
    extension.

    Scale shape: postings rows = corpus token count, so the exploded
    frame is the materialization point at 100 TB (bucket by id); the
    per-term filters cut each join side to that term's document frequency
    — stopword terms skew the FILTERED sides, never the join key — and
    the n-1 chained joins reuse one exchange per side on the same id key.
    """
    terms = phrase.split() if isinstance(phrase, str) else list(phrase)
    if not terms or any(not t for t in terms):
        raise ValueError(f"phrase needs at least one non-empty term: {phrase!r}")
    words = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "w")
    )
    hits = words.filter(F.col("w") == terms[0]).select(
        id_col, F.col("pos").alias("p0")
    )
    for i, term in enumerate(terms[1:], start=1):
        b = words.filter(F.col("w") == term).select(
            id_col, F.col("pos").alias(f"p{i}")
        )
        hits = hits.join(
            b, (hits[id_col] == b[id_col]) & (b[f"p{i}"] == hits["p0"] + i)
        ).select(hits[id_col], "p0")
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("p0").cast("long").alias("first_pos"),
    )
