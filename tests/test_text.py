"""Text-analysis operator tests (values pinned by hand on tiny fixtures;
corpus-level behavior covered by the oracle-parity suite)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_custom_transforms_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0") for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string",
    )


def test_token_stats(spark):
    out = text.token_stats(_docs(spark, ["a bb ccc a"]))
    r = out.collect()[0]
    assert (r.n_tokens, r.n_uniq_tokens, r.n_chars, r.max_token_len) == (4, 3, 10, 3)


def test_line_dedup_keeps_first_occurrence_corpus_wide(spark):
    df = spark.createDataFrame(
        [
            (1, ["alpha", "beta", "alpha"]),     # intra-doc repeat
            (2, ["beta", "gamma"]),              # cross-doc repeat of beta
            (3, ["beta"]),                       # fully duplicated doc
            (4, []),                             # empty doc
        ],
        "doc_id long, lines array<string>",
    )
    out = {r.doc_id: r.text_dedup for r in text.line_dedup(df).collect()}
    # alpha survives at (1,0); beta at (1,1); gamma at (2,1)
    assert out == {1: "alpha beta", 2: "gamma", 3: "", 4: ""}


def test_line_dedup_preserves_order_and_all_ids(spark):
    df = spark.createDataFrame(
        [(10, ["z", "a", "z", "m"]), (2, ["q"])],
        "doc_id long, lines array<string>",
    )
    out = {r.doc_id: r.text_dedup for r in text.line_dedup(df).collect()}
    # survivors keep original document order (z a m), not sorted order
    assert out == {10: "z a m", 2: "q"}


def test_line_dedup_planted_hot_line(spark):
    """Skew case: one boilerplate line present in EVERY document (the
    pathological window partition) — results stay exact: the hot line
    survives only at its first occurrence, every doc keeps its unique
    lines."""
    df = spark.createDataFrame(
        [(i, ["BOILERPLATE", f"unique-{i}"]) for i in range(200)],
        "doc_id long, lines array<string>",
    )
    out = {r.doc_id: r.text_dedup for r in text.line_dedup(df).collect()}
    assert out[0] == "BOILERPLATE unique-0"
    assert all(out[i] == f"unique-{i}" for i in range(1, 200))


def test_language_id_markers_and_tiebreak(spark):
    out = text.language_id(
        _docs(
            spark,
            [
                "the cat is here",      # en markers
                "der hund ist nicht da",  # de markers
                "xyz qqq zzz",          # nothing -> und
                "the der",              # tie 1-1 -> first lang in sorted order: de
            ],
        )
    )
    langs = [r.detected_lang for r in out.orderBy("doc_id").collect()]
    assert langs == ["en", "de", "und", "de"]


def test_language_id_cjk_script(spark):
    out = text.language_id(_docs(spark, ["你好 world the"]))
    assert out.collect()[0].detected_lang == "zh"


def test_quality_score_components(spark):
    # 25 tokens, all unique, mean len 3 -> all three components hit
    good = " ".join(f"tk{i}" for i in range(25))
    # 5 tokens -> misses length; 'a a a a a' diversity 20% fails; mean len 1 fails
    bad = "a a a a a"
    out = text.quality_score(_docs(spark, [good, bad])).orderBy("doc_id").collect()
    assert out[0].quality == 100
    assert out[1].quality == 0


def test_fingerprint_matches_hand_md5(spark):
    doc = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # two 8-token windows
    wins = ["w1 w2 w3 w4 w5 w6 w7 w8", "w2 w3 w4 w5 w6 w7 w8 w9"]
    expected = min(hashlib.md5(w.encode()).hexdigest() for w in wins)
    out = text.doc_fingerprint(_docs(spark, [doc]), window=8)
    assert out.collect()[0].fingerprint == expected


def test_fingerprint_short_doc_hashes_full_text(spark):
    doc = "only three tokens"
    out = text.doc_fingerprint(_docs(spark, [doc]), window=8)
    assert out.collect()[0].fingerprint == hashlib.md5(doc.encode()).hexdigest()


def test_rollup(spark):
    df = _docs(spark, ["a b", "c d e"])
    r = text.token_rollup(df).collect()[0]
    assert (r.n_docs, r.total_tokens, r.total_chars) == (2, 5, 8)


def test_pattern_scan_counts(spark):
    from kafka_custom_transforms_spark.operators.text import pattern_scan, pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.org or x@y.io and call 12345678"),
            (2, "see https://example.com/page?q=1 and http://a.b/c"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_email, r.n_url, r.n_long_number) for r in pattern_scan(df).collect()}
    assert got == {1: (2, 0, 1), 2: (0, 2, 0), 3: (0, 0, 0)}

    red = {r.doc_id: r.redacted for r in pii_redact(df).collect()}
    assert red[1] == "mail me at [REDACTED] or [REDACTED] and call [REDACTED]"
    assert red[2] == "see [REDACTED] and [REDACTED]"
    assert red[3] == "clean text only"


def test_normalize_text(spark):
    from kafka_custom_transforms_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, "  HeLLo   WORLD  "), (2, "already clean"), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.normalized for r in normalize_text(df).collect()}
    assert got == {1: "hello world", 2: "already clean", 3: ""}


def test_tfidf_top_terms_hand_computed(spark):
    from kafka_custom_transforms_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "common common cherry"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=2)
    got = {(r.doc_id, r.rnk): (r.tok, r.score) for r in out.collect()}
    # doc 1: apple tf=2 df=1 -> 2_000_000; banana tf=1 df=2 -> 500_000
    assert got[(1, 1)] == ("apple", 2_000_000)
    assert got[(1, 2)] == ("banana", 500_000)
    # doc 3: common tf=2 df=3 -> 666_666; cherry tf=1 df=2 -> 500_000
    assert got[(3, 1)] == ("common", 666_666)
    assert got[(3, 2)] == ("cherry", 500_000)
    # doc 2: banana and cherry both tf=1 df=2 -> tie at 500_000, token asc
    assert got[(2, 1)] == ("banana", 500_000)
    assert got[(2, 2)] == ("cherry", 500_000)


def test_repetition_stats_hand_computed(spark):
    from kafka_custom_transforms_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            # 4 lines, "spam" 3x duplicated: dup_line_frac = (4-2)/4 = 500pm;
            # dup chars = 3*4 = 12 of 4+4+4+2 = 14 chars -> 857pm
            (1, "spam\nspam\nspam\nok"),
            (2, "one two three four five six seven eight\nnine ten eleven twelve"),
            # "buy now buy now buy now": bigrams = [buy now, now buy, buy now,
            # now buy, buy now] -> top "buy now" 3 of 5 -> 600pm
            (3, "buy now buy now buy now"),
            (4, ""),  # empty text: single empty line, no bigrams, all zeros
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in repetition_stats(df).collect()}
    assert got[1]["dup_line_pm"] == 500
    assert got[1]["dup_line_char_pm"] == 857
    assert got[1]["repetitive"] is True
    assert got[2]["dup_line_pm"] == 0
    assert got[2]["repetitive"] is False
    assert got[3]["top_bigram_pm"] == 600
    assert got[3]["repetitive"] is True
    assert got[4]["n_lines"] == 1
    assert got[4]["dup_line_char_pm"] == 0
    assert got[4]["top_bigram_pm"] == 0
    assert got[4]["repetitive"] is False


def test_quality_score_without_lang_column(spark):
    from kafka_custom_transforms_spark.operators.text import quality_score

    df = spark.createDataFrame([(1, "some words here")], "doc_id long, text string")
    out = quality_score(df).collect()
    assert len(out) == 1 and "lang" not in out[0].asDict()


def test_phrase_search_two_and_three_terms(spark):
    from kafka_custom_transforms_spark.operators.text import phrase_search

    df = spark.createDataFrame(
        [
            (1, "full table scan is slow table scan again"),
            (2, "table of contents"),
            (3, "scan table scan"),
            (4, "a full table scan here"),
        ],
        "doc_id long, text string",
    )
    two = {r.doc_id: (r.n_hits, r.first_pos) for r in phrase_search(df, "table scan").collect()}
    # doc 1: positions 1 and 5; doc 3: position 1; doc 4: position 2
    assert two == {1: (2, 1), 3: (1, 1), 4: (1, 2)}

    three = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in phrase_search(df, "full table scan").collect()
    }
    assert three == {1: (1, 0), 4: (1, 1)}


def test_phrase_search_single_term_and_validation(spark):
    from kafka_custom_transforms_spark.operators.text import phrase_search

    df = spark.createDataFrame(
        [(1, "x y x"), (2, "y")], "doc_id long, text string"
    )
    one = {r.doc_id: (r.n_hits, r.first_pos) for r in phrase_search(df, "x").collect()}
    assert one == {1: (2, 0)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phrase_search(df, "")
    with _pytest.raises(ValueError):
        phrase_search(df, ["x", ""])


def test_phrase_search_plan_is_equi_join_chain(spark):
    """Every adjacency join must carry the position arithmetic in its JOIN
    KEYS — a nested-loop fallback on any of the n-1 joins would be
    O(df_term_i x df_term_j) at corpus scale."""
    from kafka_custom_transforms_spark.operators.text import phrase_search
    from kafka_custom_transforms_spark.plans.explain import plan_str

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    p = plan_str(phrase_search(df, "a b c"), "simple")
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "(p0" in p and "+ 1)" in p and "+ 2)" in p
