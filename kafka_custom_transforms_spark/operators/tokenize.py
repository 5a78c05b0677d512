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
- Encoding cost is O(unique words), not O(words): a per-process word
  cache makes repeated words (Zipf-distributed in any real corpus) a
  dict hit. The cache is bounded per executor process and shared across
  batches because workers are reused.
"""

from __future__ import annotations

import functools

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["BPE_MERGES", "bpe_encode", "tokenize_bpe", "bpe_token_counts"]

# Trained offline (see module docstring) — 24 merges keeps most corpus
# words multi-token so merge ORDER stays observable; rank = index.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"),
)


def bpe_encode(
    word: str, merges: tuple[tuple[str, str], ...] = BPE_MERGES
) -> list[str]:
    """Encode one word to its BPE symbol list (pure, deterministic)."""
    ranks = _rank_table(merges)
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
) -> DataFrame:
    """Add ``out``: array<string> of BPE tokens for ``text_col``.

    Words are the single-space split of the text (empty splits skipped —
    the same ``string_split(text, ' ')`` the oracle uses); each word's
    symbols are concatenated in order, so token COUNT is exact for
    packing budgets and the token STREAM is what a loader would embed."""

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(text: str) -> list[str]:
            toks: list[str] = []
            for w in (text or "").split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = bpe_encode(w, merges)
                toks.extend(got)
            return toks

        return texts.map(one)

    return df.withColumn(out, _enc(F.col(text_col)))


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
