"""Byte-pair-encoding tokenizer: deterministic merges-table subword encode.

The reference SMT library has no tokenizer (SURVEY.md §2.4); this is an
engine-surface extension operator — the one first-class training-data
stage the pipeline lacked: ``pack_docs`` / ``mixture_sample_docs`` /
dedup consumed whitespace token counts, while real pre-training pipelines
budget by SUBWORD tokens from a pre-trained BPE vocabulary.

Algorithm (Sennrich et al. 2016, the GPT-2 encode loop): a word starts as
its character symbols; repeatedly find the adjacent symbol pair with the
LOWEST merge rank present and fuse its first occurrence, until no adjacent
pair is in the merges table. Fusing one-occurrence-at-a-time is equivalent
to the batch left-to-right non-overlapping pass (the fused symbol is
strictly longer than either part, so it can never re-form the same pair to
its left), and it is the exact formulation the DuckDB oracle replays as a
recursive CTE — one recursion step per merge.

Production shape: the merges table is a PRE-TRAINED artifact (GPT-2's
``merges.txt``), not something the query computes — so the canonical
:data:`BPE_MERGES` below was trained ONCE, offline, with standard BPE
training (most-frequent adjacent pair, ties broken by lexicographically
smallest pair) over the synthetic documents corpus, then frozen here.
Rank = list index.

Scale design (100 TB):

- The merges table is a few hundred bytes shipped in the UDF closure —
  the distributed equivalent of every worker memory-mapping merges.txt.
  No broadcast join, no shuffle: tokenization is a pure row-local map.
- Arrow-batched ``pandas_udf``, never row-at-a-time Python.
- Encoding cost is O(unique words seen recently), not O(words): a
  per-process word cache makes repeated words (Zipf-distributed in any
  real corpus) a dict hit. The cache is an LRU bounded at
  :data:`WORD_CACHE_MAX` entries and shared across batches because
  Python workers are reused — Zipf-head words stay resident for the
  executor's lifetime while a 100 TB web corpus's unbounded unique-token
  tail (easily 10^8 per long-lived worker) evicts instead of
  accumulating tens of GB of dict.
"""

from __future__ import annotations

import functools

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "BPE_MERGES",
    "BPE_MERGES_BYTES",
    "bpe_encode",
    "bpe_decode_bytes",
    "bytes_to_unicode",
    "tokenize_bpe",
    "bpe_token_counts",
    "bpe_train",
]

# Trained offline (see module docstring) — 24 merges keeps most corpus
# words multi-token so merge ORDER stays observable; rank = index.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"),
)


# Byte-level variant of the frozen table: the printable-ASCII bytes map
# to themselves under bytes_to_unicode(), so every character-level merge
# above applies verbatim to ASCII text; the two extra ranks fuse the
# mapped UTF-8 byte pairs of 'ä' (C3 A4 -> 'Ã','¤') and 'é'
# (C3 A9 -> 'Ã','©') so multi-byte codepoints re-fuse into whole-
# character tokens instead of fragmenting.
BPE_MERGES_BYTES: tuple[tuple[str, str], ...] = BPE_MERGES + (
    ("\xc3", "\xa4"), ("\xc3", "\xa9"),
)


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's byte-to-unicode table (Radford et al. 2019, the public
    gpt-2 ``encoder.py``): visually printable bytes map to themselves,
    the rest to codepoints 256+n, giving a reversible 256-symbol
    alphabet with no whitespace/control characters — BPE then operates
    on mapped UTF-8 bytes, so ANY unicode text tokenizes with a finite
    base vocabulary (no unknown-character fragmentation)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def bpe_decode_bytes(tokens: list[str]) -> str:
    """Invert byte-level tokens back to the original text: concatenate,
    map each symbol back to its byte, UTF-8 decode. Exact inverse of
    ``bpe_encode(..., byte_level=True)`` for any input (merges only
    concatenate symbols, never alter them)."""
    inv = {c: b for b, c in bytes_to_unicode().items()}
    return bytes(inv[c] for c in "".join(tokens)).decode("utf-8")


def bpe_encode(
    word: str,
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
    byte_level: bool = False,
) -> list[str]:
    """Encode one word to its BPE symbol list (pure, deterministic).

    ``byte_level=True`` starts from the word's mapped UTF-8 bytes
    (:func:`bytes_to_unicode`) instead of its characters — the GPT-2
    formulation; the merge loop itself is identical."""
    ranks = _rank_table(merges)
    if byte_level:
        table = bytes_to_unicode()
        syms = [table[b] for b in word.encode("utf-8")]
    else:
        syms = list(word)
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = merges[best]
        for i in range(len(syms) - 1):
            if syms[i] == a and syms[i + 1] == b:
                syms = syms[:i] + [a + b] + syms[i + 2 :]
                break
    return syms


@functools.lru_cache(maxsize=8)
def _rank_table(merges: tuple[tuple[str, str], ...]) -> dict:
    return {pair: i for i, pair in enumerate(merges)}


def tokenize_bpe(
    df: DataFrame,
    text_col: str = "text",
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
    out: str = "bpe_tokens",
    byte_level: bool = False,
) -> DataFrame:
    """Add ``out``: array<string> of BPE tokens for ``text_col``.

    Words are the single-space split of the text (empty splits skipped —
    the same ``string_split(text, ' ')`` the oracle uses); each word's
    symbols are concatenated in order, so token COUNT is exact for
    packing budgets and the token STREAM is what a loader would embed.
    ``byte_level=True`` tokenizes mapped UTF-8 bytes (GPT-2 style) so
    arbitrary unicode text gets a finite base vocabulary."""

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        # process-global cache keyed by (merges, byte_level): the udf
        # body runs once per Arrow batch, but reused Python workers keep
        # the module state, so Zipf-head words are encoded once per
        # process, not once per batch
        enc = _cached_encoder(merges, byte_level)

        def one(text: str) -> list[str]:
            toks: list[str] = []
            for w in (text or "").split(" "):
                if w:
                    toks.extend(enc(w))
            return toks

        return texts.map(one)

    return df.withColumn(out, _enc(F.col(text_col)))


# Per-(merges, byte_level) word-cache bound. Honest worst case: an
# OrderedDict/lru_cache entry (link node + key str + token list) runs
# ~250-300 B, so one full cache is ~70-80 MB, and a worker that served
# up to 8 distinct (merges, byte_level) encoders (the outer cache bound)
# could hold ~0.6 GB — still bounded, vs the tens of GB an UNBOUNDED
# dict reaches on a 100 TB corpus's unique-token tail (10^8+ words per
# long-lived worker). Realistic workers run 1-2 encoders.
WORD_CACHE_MAX = 1 << 18  # 262,144 entries — far past any Zipf knee


@functools.lru_cache(maxsize=8)
def _cached_encoder(
    merges: tuple[tuple[str, str], ...],
    byte_level: bool = False,
    maxsize: int = WORD_CACHE_MAX,
):
    """Per-(merges, byte_level) word encoder with a bounded C-speed LRU:
    the inner lru_cache keys on the word alone (one cached-hash probe
    per hit; str caches its hash), evicting least-recently-used words
    past ``maxsize``. The cached value is a TUPLE so the object shared
    across hits is immutable — a caller mutating it would otherwise
    silently corrupt cached encodings for the process lifetime."""

    @functools.lru_cache(maxsize=maxsize)
    def enc(word: str) -> tuple[str, ...]:
        return tuple(bpe_encode(word, merges, byte_level))

    return enc


# Two-character symbol boundary for the segmentation string. The merge
# for pair (l, r) is applied as ONE string replace:
#
#     C2 · l · C1 C2 · r · C1   ->   C2 · lr · C1
#
# i.e. the pattern consumes only the INNER halves of the two flanking
# boundaries, leaving the outer C1 (left) and C2 (right) in place for the
# neighboring pairs. This matters for back-to-back occurrences
# ([a,n,a,n] with pair (a,n)): with a single-char boundary the pattern
# must consume the shared separator, so replace() — which resumes AFTER
# the inserted text — silently skips every second occurrence and diverges
# from the BPE batch pass. With the split boundary the next occurrence's
# leading C2 is still unscanned, so one replace() pass merges exactly the
# left-to-right non-overlapping occurrences = the batch merge
# (test_bpe_train_matches_reference pins this against an independent
# trainer, including the banana/bandana back-to-back case).
# A false match inside a symbol is impossible: C2 occurs only
# immediately before a symbol start and C1 only immediately after a
# symbol end, so "C2·l·C1" can only match the whole symbol l.
_B1, _B2 = "\x1e", "\x1f"
_BOUND = _B1 + _B2

# Vocabulary-size cap for running the BPE training rounds locally on the
# driver (the corpus is still aggregated distributed, ONCE). A natural-
# language word vocabulary is corpus-sublinear and usually far below this;
# web-scale corpora with unbounded token sets fall back to the distributed
# vocabulary-table rounds.
MAX_LOCAL_VOCAB = 65536


def _round_takes(n_merges: int, batch_size: int) -> list[int]:
    """Static per-round accept budgets: full batches then the remainder.
    STATIC is load-bearing — the DuckDB oracle unrolls exactly these
    rounds as CTEs, so the engine must not re-plan rounds dynamically
    when a candidate window comes up short."""
    bs = max(batch_size, 1)
    takes = [bs] * (n_merges // bs)
    if n_merges % bs:
        takes.append(n_merges % bs)
    return takes


def _bpe_rounds_local(
    rows: list[tuple[int, str]], n_merges: int, batch_size: int
) -> "pd.DataFrame":
    """The training rounds of :func:`bpe_train` on a driver-local
    vocabulary — the exact same procedure (candidate window 8*take in
    (cnt DESC, l, r) order, greedy symbol-disjoint accepts, chained
    left-to-right non-overlapping replace), bit-equal by construction and
    pinned against the distributed rounds in tests/test_tokenize.py."""
    merges: list[tuple[int, str, str, int]] = []
    segs = rows
    for take in _round_takes(n_merges, batch_size):
        window = 8 * take
        counts: dict[tuple[str, str], int] = {}
        for freq, seg in segs:
            inner = seg.split(_BOUND)[1:-1]
            for pair in zip(inner, inner[1:]):
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:window]
        used: set[str] = set()
        accepted: list[tuple[str, str, int]] = []
        for (l, r), cnt in top:
            if len(accepted) == take:
                break
            if l in used or r in used:
                continue
            accepted.append((l, r, cnt))
            used.update((l, r))
        for l, r, cnt in accepted:
            merges.append((len(merges), l, r, cnt))
            pat = _B2 + l + _BOUND + r + _B1
            rep = _B2 + l + r + _B1
            segs = [(freq, seg.replace(pat, rep)) for freq, seg in segs]
        # the top candidate is always disjoint-acceptable, so every round
        # makes progress; a shortfall just means the NEXT round recounts
    return pd.DataFrame(merges, columns=["step", "left", "right", "pair_count"])


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    byte_level: bool = False,
    batch_size: int = 1,
) -> "pd.DataFrame":
    """Learn a BPE merges table from a corpus (Sennrich et al. 2016
    training): each round counts adjacent symbol pairs over the current
    segmentation, weighted by word frequency, and fuses the most
    frequent pair — ties broken by the lexicographically smallest
    (left, right), the same deterministic rule that produced the frozen
    :data:`BPE_MERGES`. Returns a pandas DataFrame
    ``(step, left, right, pair_count)`` with exactly ``n_merges`` rows
    (fewer only if the vocabulary runs out of pairs).

    Scale design (100 TB): the corpus is touched ONCE — a word-frequency
    aggregate (one shuffle, map-side partials). Every training round then
    operates on the VOCABULARY table (orders of magnitude smaller than
    the corpus), fully in Catalyst:

    - a word's segmentation is kept as a boundary-joined STRING
      (``C1C2 sym C1C2 sym ... C1C2``), so applying the round's merge is
      ONE ``replace(seg, C2·l·C1C2·r·C1, C2·lr·C1)`` whose left-to-right
      non-overlapping scan equals the BPE batch-merge pass exactly (see
      the :data:`_BOUND` comment for why the boundary must be split
      across the pattern edges);
    - pair counting is ``arrays_zip(slice, slice)`` + explode + one
      vocabulary-sized groupBy per round;
    - the only driver traffic is ONE (pair, count) row per round — the
      merges table itself, which is the training OUTPUT, not data.

    ``byte_level=True`` trains the GPT-2 formulation: a word's initial
    symbols are its UTF-8 bytes mapped through :func:`bytes_to_unicode`
    (built by a vocabulary-sized Arrow-batched pandas_udf — one pass
    over the word table, never the corpus); learned merges slot
    directly into ``bpe_encode(..., byte_level=True)``. The training
    rounds themselves are identical — merged symbols are just
    concatenations of mapped byte symbols, which can never collide with
    the boundary bytes (every mapped codepoint is printable or
    >= U+0100).

    Words containing either boundary byte are dropped (guard, not
    semantics: RS/US never occur in text corpora).

    ``batch_size > 1`` accepts up to that many SYMBOL-DISJOINT merges per
    counting round (greedy down the (cnt DESC, l, r) order, skipping any
    pair that shares a symbol with an earlier accept of the same round).
    Disjoint pairs' counts are invariant under each other's merges — a
    merge only perturbs pairs adjacent to its own symbols — so reported
    counts stay exact; the merge SEQUENCE may differ from batch_size=1
    (a pair created by an earlier merge can outrank a later batch member
    in the sequential order). It is a deterministic, oracle-replayable
    trade of merge-order fidelity for ~batch_size fewer vocabulary jobs
    and driver round-trips per training run."""
    if byte_level:

        @pandas_udf("string")
        def _seg0(words: pd.Series) -> pd.Series:
            table = bytes_to_unicode()
            return words.map(
                lambda w: _BOUND
                + _BOUND.join(table[b] for b in w.encode("utf-8"))
                + _BOUND
            )

        seg0 = _seg0(F.col("w"))
    else:
        # initial segmentation: every character a symbol
        seg0 = F.concat(
            F.lit(_BOUND),
            F.array_join(F.split(F.col("w"), ""), _BOUND),
            F.lit(_BOUND),
        )
    vocab = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(
            (F.col("w") != "")
            & (~F.col("w").contains(_B1))
            & (~F.col("w").contains(_B2))
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("seg", seg0)
        .select("freq", "seg")
    )
    vocab = vocab.localCheckpoint(eager=True)  # vocab-sized; rounds reuse it
    local_rows = vocab.limit(MAX_LOCAL_VOCAB + 1).collect()
    if len(local_rows) <= MAX_LOCAL_VOCAB:
        # The vocabulary fits the driver: run every round locally — zero
        # Spark jobs per round instead of one count + one checkpoint each
        # (the corpus was still touched exactly once, by the distributed
        # word-frequency aggregate above). Identical algorithm, pinned
        # bit-equal to the distributed rounds in tests: Python's
        # str.replace is the same left-to-right non-overlapping scan as
        # the JVM's/DuckDB's, and Python str ordering (code points)
        # equals Spark's binary UTF8 ordering on valid UTF-8.
        return _bpe_rounds_local(
            [(int(r.freq), r.seg) for r in local_rows], n_merges, batch_size
        )
    merges: list[tuple[int, str, str, int]] = []
    for take in _round_takes(n_merges, batch_size):
        # Candidate window: 8x the batch gives the greedy scan room to
        # skip symbol-overlapping pairs; the oracle replays the SAME
        # window (LIMIT 8*take), so a shortfall is mirrored, not a bug.
        # The round structure is STATIC (so the oracle's unrolled CTEs
        # replay it exactly): an under-filled round is NOT retried —
        # training may return fewer than n_merges merges.
        window = 8 * take
        syms = F.split(F.col("seg"), _BOUND)
        # split produces leading/trailing empties: real symbols are 2..n-1
        n = F.size(syms)
        pairs = F.arrays_zip(
            F.slice(syms, 2, n - 3).alias("l"),
            F.slice(syms, 3, n - 3).alias("r"),
        )
        top = (
            vocab.select(F.col("freq"), F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(window)
            .collect()
        )
        if not top:
            break
        # Greedy batch selection: accept the next-ranked pair only when
        # BOTH its symbols are untouched by this round's earlier accepts.
        # Symbol-disjoint pairs have INVARIANT counts under each other's
        # merges (a merge only perturbs pairs adjacent to its own
        # symbols), so the reported counts stay exact and one recount per
        # ROUND replaces one recount per MERGE — batch_size fewer
        # vocabulary jobs and driver round-trips (r8 verdict item 4).
        # Known aliasing exception (r10 advice): if an accepted merge's
        # concatenation l+r happens to equal a PRE-EXISTING symbol that a
        # later accept of the same round touches, that later merge also
        # matches occurrences the earlier replace just created, so its
        # recorded pair_count can be stale in that corner. All three
        # replayers (engine, driver-local fast path, DuckDB oracle) run
        # the identical greedy scan and replaces, so parity is unaffected
        # — only the "counts stay exact" claim carries this asterisk.
        used: set[str] = set()
        accepted: list[tuple[str, str, int]] = []
        for row in top:
            if len(accepted) == take:
                break
            if row.l in used or row.r in used:
                continue
            accepted.append((row.l, row.r, int(row.cnt)))
            used.update((row.l, row.r))
        seg_col = F.col("seg")
        for l, r, cnt in accepted:
            merges.append((len(merges), l, r, cnt))
            seg_col = F.replace(
                seg_col,
                F.lit(_B2 + l + _BOUND + r + _B1),
                F.lit(_B2 + l + r + _B1),
            )
        vocab = vocab.withColumn("seg", seg_col).localCheckpoint(eager=True)
        # the top candidate is always disjoint-acceptable, so every round
        # makes progress; a shortfall just means the NEXT round recounts
    return pd.DataFrame(
        merges, columns=["step", "left", "right", "pair_count"]
    )


def bpe_token_counts(
    df: DataFrame,
    text_col: str = "text",
    merges: tuple[tuple[str, str], ...] = BPE_MERGES,
    out: str = "n_bpe_tokens",
) -> DataFrame:
    """Add ``out``: bigint count of BPE tokens — the packing/budgeting
    input (`pack_sequences` consumes exactly this column)."""
    tmp = "_bpe_toks_for_count"
    return (
        tokenize_bpe(df, text_col, merges, out=tmp)
        .withColumn(out, F.size(F.col(tmp)).cast("long"))
        .drop(tmp)
    )
