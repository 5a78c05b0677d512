"""BPE tokenizer tests: known encodings against the frozen merges table,
equivalence of the one-at-a-time merge loop with the batch left-to-right
pass (the property the DuckDB oracle's recursive CTE relies on), Spark
column parity with the pure function, and packing integration — real
subword token counts flowing into pack_sequences."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from kafka_custom_transforms_spark.operators.tokenize import (
    BPE_MERGES,
    BPE_MERGES_BYTES,
    _cached_encoder,
    bpe_decode_bytes,
    bpe_encode,
    bpe_token_counts,
    bytes_to_unicode,
    tokenize_bpe,
)


def test_known_encodings():
    assert bpe_encode("column") == ["co", "lu", "m", "n"]
    assert bpe_encode("customer") == ["cu", "st", "o", "mer"]
    assert bpe_encode("hash") == ["hash"]
    assert bpe_encode("batch") == ["batch"]
    assert bpe_encode("join") == ["join"]
    assert bpe_encode("filter") == ["f", "i", "l", "t", "er"]
    assert bpe_encode("a") == ["a"]
    assert bpe_encode("") == []


def test_merge_rank_order_matters():
    # 'scan': s+c is NOT a merge; a+n (rank 19) fires before c+an exists,
    # then c+an (20), then s+can (21) — the full chain must run in rank
    # order to converge to one token.
    assert bpe_encode("scan") == ["scan"]
    # 'sc' alone has no applicable merge at all
    assert bpe_encode("sc") == ["s", "c"]


def _batch_encode(word, merges):
    """Reference batch formulation: merge ALL left-to-right non-overlapping
    occurrences of the best-ranked present pair per round."""
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        present = [
            ranks[p]
            for p in zip(syms, syms[1:])
            if p in ranks
        ]
        if not present:
            break
        a, b = merges[min(present)]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", max_size=24))
def test_one_at_a_time_equals_batch(word):
    assert bpe_encode(word) == _batch_encode(word, BPE_MERGES)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abc", max_size=16), st.data())
def test_equivalence_holds_for_trainable_merge_tables(word, data):
    """One-at-a-time vs batch-per-round merging coincide for TRAINABLE
    tables only: every merge's operands must be single characters or the
    results of strictly earlier merges (the invariant real BPE training
    guarantees). Build tables constructively under that invariant — the
    old fully-arbitrary strategy was a FALSE property, falsified by
    Hypothesis (r13) with the untrainable table below."""
    vocab = ["a", "b", "c"]
    merges: list = []
    for _ in range(data.draw(st.integers(0, 8), label="n_merges")):
        a = vocab[data.draw(st.integers(0, len(vocab) - 1), label="left")]
        b = vocab[data.draw(st.integers(0, len(vocab) - 1), label="right")]
        if (a, b) in merges:
            continue
        merges.append((a, b))
        vocab.append(a + b)
    merges = tuple(merges)
    assert bpe_encode(word, merges) == _batch_encode(word, merges)


def test_untrainable_tables_diverge_by_design():
    """The Hypothesis-found counterexample, pinned: with ('cc','c')
    ranked ABOVE ('c','c') — impossible under training, since 'cc' only
    exists once ('c','c') has merged — the two formulations legitimately
    split. bpe_encode holds the one-lowest-rank-pair-at-a-time contract
    (the tiktoken semantics); the batch reference merges all occurrences
    of the round's best pair (the GPT-2 reference-code semantics). Both
    are internally consistent; they only meet on trainable tables."""
    merges = (("cc", "c"), ("c", "c"))
    assert bpe_encode("cccc", merges) == ["ccc", "c"]
    assert _batch_encode("cccc", merges) == ["cc", "cc"]


def test_tokenize_column_matches_pure_function(spark):
    rows = [(0, "customer join a filter"), (1, "hash  batch"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.bpe_tokens
        for r in tokenize_bpe(df, "text").collect()
    }
    for doc_id, text in rows:
        want = []
        for w in text.split(" "):
            if w:
                want.extend(bpe_encode(w))
        assert got[doc_id] == want


def test_token_counts_and_packing_integration(spark, sf_dir):
    """End-to-end: BPE token counts budget a real packing run — every
    packed sequence's occupancy ends exactly at the sum of its members'
    BPE counts and never exceeds the context window."""
    from kafka_custom_transforms_spark.operators.packing import pack_sequences
    from kafka_custom_transforms_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    counted = bpe_token_counts(docs, "text")
    row = counted.select(
        F.min("n_bpe_tokens").alias("lo"), F.max("n_bpe_tokens").alias("hi")
    ).collect()[0]
    assert row.lo >= 1  # every doc has words
    assigned = pack_sequences(
        counted, tokens_col="n_bpe_tokens", context_len=256, n_buckets=8
    ).collect()
    by_seq: dict = {}
    for r in assigned:
        by_seq.setdefault((r.bucket, r.seq), []).append(r)
    assert len(assigned) == 200
    for members in by_seq.values():
        members.sort(key=lambda r: r.pack_offset)
        fill = 0
        for m in members:
            assert m.pack_offset == fill
            fill += m.n_bpe_tokens
        assert fill <= 256 or len(members) == 1  # oversize doc sits alone


def _reference_train(word_freqs, n_merges):
    """Offline Sennrich trainer: most frequent pair, ties broken by the
    lexicographically smallest (left, right)."""
    words = {w: list(w) for w in word_freqs}
    out = []
    for _ in range(n_merges):
        pc: dict = {}
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + word_freqs[w]
        if not pc:
            break
        top = max(pc.values())
        a, b = min(p for p, c in pc.items() if c == top)
        out.append((a, b, top))
        for w, syms in words.items():
            i, ns = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            words[w] = ns
    return out


def test_bpe_train_matches_reference(spark):
    from kafka_custom_transforms_spark.operators.tokenize import bpe_train

    texts = [
        "banana bandana banana",
        "ananas banana cabana",
        "cab cab bandana ananas",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    wf: dict = {}
    for t in texts:
        for w in t.split(" "):
            wf[w] = wf.get(w, 0) + 1
    want = _reference_train(wf, 6)
    got = bpe_train(df, "text", n_merges=6)
    assert [
        (r.left, r.right, r.pair_count) for r in got.itertuples()
    ] == want
    assert list(got.step) == list(range(len(want)))


def test_bpe_train_feeds_encode(spark):
    """Learned merges slot straight into the encoder: rank = step."""
    from kafka_custom_transforms_spark.operators.tokenize import bpe_train

    df = spark.createDataFrame(
        [("banana banana bandana",)], "text string"
    )
    learned = bpe_train(df, "text", n_merges=4)
    merges = tuple(zip(learned.left, learned.right))
    enc = bpe_encode("banana", merges)
    assert enc == _batch_encode("banana", merges)
    assert len(enc) < len("banana")  # merges actually fired


def test_wordless_doc_oracle_parity(spark):
    """A doc with empty/all-space text must produce (0, 0, '') on BOTH
    engines — the DuckDB oracle left-joins documents for exactly this
    case (code-review r5 finding: the group-by alone drops the doc)."""
    import duckdb

    import __spark_entry__ as entry_mod

    rows = [(0, ""), (1, "   "), (2, "hash join")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.n_tokens, r.n_words, r.first_tokens)
        for r in entry_mod._bpe_doc_stats(sdf).collect()
    )
    con = duckdb.connect()
    con.execute("create table documents(doc_id bigint, text varchar)")
    con.executemany("insert into documents values (?, ?)", rows)
    want = sorted(tuple(r) for r in con.sql(
        entry_mod._bpe_oracle_sql()
    ).fetchall())
    assert got == want
    assert got[0][1:] == (0, 0, "") and got[1][1:] == (0, 0, "")


def test_word_cache_is_lru_bounded():
    """The per-process word cache must evict past its cap (a 100 TB
    corpus's unique-token tail would otherwise grow a long-lived
    executor's memory without bound) while keeping recently-USED words
    resident — a hit refreshes recency."""
    _cached_encoder.cache_clear()
    enc = _cached_encoder(BPE_MERGES, False, 3)
    for w in ("alpha", "beta", "gamma"):
        enc(w)
    assert enc.cache_info().currsize == 3
    enc("alpha")  # refresh: 'beta' is now LRU
    assert enc.cache_info().hits == 1
    enc("delta")  # insert past the cap -> evict exactly one
    assert enc.cache_info().currsize == 3
    hits0 = enc.cache_info().hits
    enc("alpha"), enc("gamma"), enc("delta")  # all resident
    assert enc.cache_info().hits == hits0 + 3
    enc("beta")  # the evicted one misses...
    assert enc.cache_info().hits == hits0 + 3
    assert enc.cache_info().currsize == 3  # ...and never exceeds the cap
    # values stay correct, and the shared cached object is IMMUTABLE —
    # a tuple, so no caller can corrupt the cache by mutating it
    assert enc("beta") == tuple(bpe_encode("beta"))
    assert isinstance(enc("beta"), tuple)
    _cached_encoder.cache_clear()


def test_bytes_to_unicode_table():
    """GPT-2 mapping invariants: a 256-symbol bijection, printable ASCII
    maps to itself, control/whitespace bytes map above U+00FF."""
    t = bytes_to_unicode()
    assert len(t) == 256 and len(set(t.values())) == 256
    for b in range(ord("!"), ord("~") + 1):
        assert t[b] == chr(b)
    for b in (0, 9, 10, 13, 32, 127, 173):
        assert ord(t[b]) >= 256
    assert not any(ch.isspace() for ch in t.values())


def test_byte_level_known_encodings():
    # printable ASCII bytes map to themselves, so character-level merges
    # apply verbatim on ASCII words...
    assert bpe_encode("hash", BPE_MERGES_BYTES, byte_level=True) == ["hash"]
    assert bpe_encode("join", BPE_MERGES_BYTES, byte_level=True) == ["join"]
    # ...while multi-byte codepoints re-fuse via the byte-pair ranks
    # ('ä' = C3 A4 -> 'Ã'+'¤' -> 'Ã¤'; 'é' = C3 A9 -> 'Ã©')
    assert bpe_encode("ä", BPE_MERGES_BYTES, byte_level=True) == ["\xc3\xa4"]
    assert bpe_encode("éä", BPE_MERGES_BYTES, byte_level=True) == [
        "\xc3\xa9", "\xc3\xa4"
    ]
    # char-level merges still fire around the fused bytes
    assert bpe_encode("bänänä", BPE_MERGES_BYTES, byte_level=True) == [
        "b", "\xc3\xa4", "n", "\xc3\xa4", "n", "\xc3\xa4"
    ]


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=24).filter(lambda s: " " not in s))
def test_byte_level_roundtrips_any_unicode(word):
    """Invertibility: merges only concatenate mapped byte symbols, so
    joining the tokens and un-mapping recovers the exact input — for ANY
    unicode word, including characters no merge table has seen."""
    toks = bpe_encode(word, BPE_MERGES_BYTES, byte_level=True)
    assert bpe_decode_bytes(toks) == word


def test_byte_level_tokenize_column_matches_pure_function(spark):
    rows = [(0, "bänänä éäst"), (1, "hash join"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.bpe_tokens
        for r in tokenize_bpe(
            df, "text", BPE_MERGES_BYTES, byte_level=True
        ).collect()
    }
    for doc_id, text in rows:
        want = []
        for w in text.split(" "):
            if w:
                want.extend(bpe_encode(w, BPE_MERGES_BYTES, byte_level=True))
        assert got[doc_id] == want


def _reference_train_bytes(word_freqs, n_merges):
    """Byte-level reference trainer: map words through bytes_to_unicode
    first, then run the same most-frequent-pair loop."""
    t = bytes_to_unicode()
    mapped = {
        "".join(t[b] for b in w.encode("utf-8")): f for w, f in word_freqs.items()
    }
    return _reference_train(mapped, n_merges)


def test_bpe_train_byte_level_matches_reference(spark):
    """Byte-level training on non-ASCII text: multi-byte codepoints
    enter as mapped byte symbols and the most frequent merges re-fuse
    them — matching an independent byte-level trainer exactly."""
    from kafka_custom_transforms_spark.operators.tokenize import bpe_train

    texts = [
        "bänänä bändänä bänänä",
        "änänäs bänänä cäbänä",
        "café café crème bändänä",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    wf: dict = {}
    for t in texts:
        for w in t.split(" "):
            wf[w] = wf.get(w, 0) + 1
    want = _reference_train_bytes(wf, 6)
    got = bpe_train(df, "text", n_merges=6, byte_level=True)
    assert [
        (r.left, r.right, r.pair_count) for r in got.itertuples()
    ] == want
    # the top merge must fuse the 'ä' UTF-8 byte pair (C3 A4 dominates)
    assert (want[0][0], want[0][1]) == ("\xc3", "\xa4")


def test_bpe_train_byte_level_feeds_encode(spark):
    """Learned byte-level merges slot straight into the byte-level
    encoder and the token stream still inverts to the original text."""
    from kafka_custom_transforms_spark.operators.tokenize import bpe_train

    df = spark.createDataFrame(
        [("bänänä bänänä bändänä",)], "text string"
    )
    learned = bpe_train(df, "text", n_merges=5, byte_level=True)
    merges = tuple(zip(learned.left, learned.right))
    enc = bpe_encode("bänänä", merges, byte_level=True)
    assert len(enc) < len("bänänä".encode("utf-8"))  # merges fired
    assert bpe_decode_bytes(enc) == "bänänä"


def test_bpe_train_local_matches_distributed(spark, monkeypatch):
    """The driver-local training rounds (vocab under MAX_LOCAL_VOCAB) must
    be bit-identical to the distributed vocabulary-table rounds — same
    merges, same order, same counts — sequential AND batched."""
    from kafka_custom_transforms_spark.operators import tokenize as tk

    df = spark.createDataFrame(
        [
            ("banana bandana banana cabana",),
            ("ananas banana cab cab bandana",),
            ("the cat sat on the mat the cat",),
        ],
        "text string",
    )
    for bs in (1, 3):
        local = tk.bpe_train(df, "text", n_merges=7, batch_size=bs)
        monkeypatch.setattr(tk, "MAX_LOCAL_VOCAB", 0)
        dist = tk.bpe_train(df, "text", n_merges=7, batch_size=bs)
        monkeypatch.undo()
        assert local.values.tolist() == dist.values.tolist(), bs
        # static rounds may under-fill on a tiny corpus (mirrored by the
        # oracle's empty accept slots); sequential always fills
        assert len(local) == 7 if bs == 1 else len(local) >= 5
        assert list(local.step) == list(range(len(local)))


def test_bpe_train_batched_counts_are_exact(spark):
    """Symbol-disjoint batch accepts report the same pair_count the
    sequential trainer would have seen at that merge's turn whenever the
    accepted pairs stay disjoint from pairs CREATED by earlier batch
    members — pinned on a corpus where batch and sequential agree."""
    from kafka_custom_transforms_spark.operators.tokenize import bpe_train

    df = spark.createDataFrame(
        [("aa bb aa bb cc dd cc dd ee ff",)], "text string"
    )
    seq = bpe_train(df, "text", n_merges=3, batch_size=1)
    bat = bpe_train(df, "text", n_merges=3, batch_size=3)
    assert sorted(map(tuple, seq[["left", "right", "pair_count"]].values.tolist())) == \
           sorted(map(tuple, bat[["left", "right", "pair_count"]].values.tolist()))
