"""Vectorized XXH64 over variable-length byte strings (NumPy).

Bit-identical to Spark's ``xxhash64(col)`` for a single string column
(XXH64 of the UTF-8 bytes, seed 42, result as a signed long) — pinned by
tests/test_xxh64_np.py against Spark itself over random unicode strings of
every structural length class (0, <4, <8, <32, multi-stripe) plus real
corpus shingles.

Why this exists (guide §4.1/§4.2): the MinHash signature stage previously
computed per-gram base hashes with the interpreted higher-order function
``transform(sh, s -> pmod(xxhash64(s), p))`` (HOF lambdas never reach
whole-stage codegen), then crossed the JVM->Python boundary a second time
for the numpy mod-min. Reproducing XXH64 in numpy lets the whole
(hash + 128-permutation mod-min) stage run as ONE Arrow pass over the
shingle arrays. The JVM hash family is unchanged — same bits, same LSH
candidates, same results.

Performance shape (measured on the corpus shingle distribution: mean gram
15.5 B, max 26 B): word shingles are virtually always < 32 bytes, so the
hot path (:func:`xxh64_short`) is STRIPE-FREE and SCATTER-FREE — the tail
u64 words are assembled straight from the shared Arrow values buffer with
1-D byte gathers (an (n, 32) window gather was A/B'd and lost: building
its index matrix alone cost more than the whole assembly), and bytes past
a row's true length are simply never read into the result (every XXH64
tail lane a row does not have is discarded by its mask), so no zeroing or
padding pass exists at all. The mixed u32-then-bytes remainder always
lives inside one aligned u64 word, so a single ``take_along_axis`` gather
+ shifts resolves it. The general path (:func:`xxh64_bytes`, any length)
pads into a matrix and runs the 32-byte stripe phase over the subset of
rows that have stripes.

All arithmetic is uint64 with natural mod-2^64 wraparound (numpy unsigned
overflow is silent and well-defined).

(A shift-add Mersenne fold replacing the ``% (2^31-1)`` reductions was
A/B'd and LOST to numpy's int64 ``%`` — the fold's extra temporary passes
cost more than the division saves once the chunk is cache-resident; the
winning lever was chunk sizing, applied at the call site in texthash.)
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)

_MASK64 = (1 << 64) - 1


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def _round(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _rotl(acc + lane * _P2, 31) * _P1


def _merge_round(h: np.ndarray, v: np.ndarray) -> np.ndarray:
    return (h ^ _round(np.uint64(0), v)) * _P1 + _P4


def _tail_mix(h: np.ndarray, t64: np.ndarray, rem: np.ndarray) -> np.ndarray:
    """Mix each row's <= 31 remaining bytes into ``h`` and avalanche.

    ``t64`` is an (n, 4) uint64 matrix of the row's four little-endian
    tail words; words (or high bytes) past ``rem[i]`` may be ARBITRARY
    GARBAGE — every lane a row does not have is discarded by its mask, so
    garbage never reaches the result. ``h`` must already include the +len
    term."""

    # 0-3 full u64 lanes (direct column views, no gathers).
    n8 = rem >> 3  # 0..3
    for j in range(3):
        m = n8 > j
        k1 = _round(np.uint64(0), t64[:, j])
        h = np.where(m, _rotl(h ^ k1, 27) * _P1 + _P4, h)

    # The mixed remainder (0-1 u32 lane, then 0-3 bytes) always lives in
    # the single aligned u64 word at lane index n8: one gather + shifts.
    g = np.take_along_axis(t64, n8[:, None], axis=1)[:, 0]
    rem4 = rem - (n8 << 3)  # 0..7
    has32 = rem4 >= 4
    lane32 = g & np.uint64(0xFFFFFFFF)
    h = np.where(has32, _rotl(h ^ (lane32 * _P1), 23) * _P2 + _P3, h)

    n1 = np.where(has32, rem4 - 4, rem4)  # 0..3 trailing bytes
    base_shift = np.where(has32, np.uint64(32), np.uint64(0))
    for j in range(3):
        m = n1 > j
        b = (g >> (base_shift + np.uint64(8 * j))) & np.uint64(0xFF)
        h = np.where(m, _rotl(h ^ (b * _P5), 11) * _P1, h)

    # Avalanche.
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h.view(np.int64)


def xxh64_short(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray, seed: int = 42
) -> np.ndarray:
    """XXH64 of n byte slices ``data[starts[i] : starts[i]+lens[i]]``, ALL
    SHORTER than 32 bytes, as signed int64 — the zero-scatter hot path.

    Assembles only the tail u64 words any row can actually use, straight
    from the shared buffer with 1-D byte gathers (no (n, 32) window, no
    index matrix). ``data`` must be readable at ``starts[i] + 31`` for
    every row (pad the buffer tail with up to 31 zero bytes if the last
    slice ends near its end); bytes past a slice's length are never read
    into the result."""
    n = len(lens)
    w = np.zeros((n, 4), dtype=np.uint64)
    n_words = (int(lens.max()) >> 3) + 1 if n else 0  # highest word any row touches
    for j in range(n_words):
        base = starts + 8 * j
        acc = data[base].astype(np.uint64)
        for k in range(1, 8):
            acc |= data[base + k].astype(np.uint64) << np.uint64(8 * k)
        w[:, j] = acc
    h = np.full(n, (seed + int(_P5)) & _MASK64, dtype=np.uint64) + lens.astype(
        np.uint64
    )
    return _tail_mix(h, w, lens)


def xxh64_bytes(data, seed: int = 42) -> np.ndarray:
    """XXH64 of each byte string (any length), as SIGNED int64 (Spark's
    xxhash64 view). ``data`` is a sequence of ``bytes``. General path:
    zero-pads into an (n, width) matrix so the stripe phase can read
    aligned u64 lanes via a dtype view."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(b) for b in data), dtype=np.int64, count=n)
    joined = np.frombuffer(b"".join(data), dtype=np.uint8)
    max_len = int(lens.max())
    if max_len < 32:
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        pad = np.concatenate([joined, np.zeros(32, dtype=np.uint8)])
        return xxh64_short(pad, starts, lens, seed)
    width = ((max_len + 31) // 32) * 32 + 32
    mat = np.zeros((n, width), dtype=np.uint8)
    mat[np.arange(width)[None, :] < lens[:, None]] = joined
    return _xxh64_mat(mat, lens, seed)


def _xxh64_mat(mat: np.ndarray, lens: np.ndarray, seed: int) -> np.ndarray:
    """XXH64 of each row of a zero-padded byte matrix whose width is a
    multiple of 32 (so stripe lanes are aligned u64 views)."""
    n = mat.shape[0]
    n_stripes = lens >> 5
    max_stripes = int(n_stripes.max())

    h = np.full(n, (seed + int(_P5)) & _MASK64, dtype=np.uint64)
    if max_stripes == 0:
        tail = mat if mat.shape[1] == 32 else np.ascontiguousarray(mat[:, :32])
        rem = lens
    else:
        u64 = mat.view("<u8")  # aligned stripe lanes
        striped = np.nonzero(n_stripes > 0)[0]
        v1 = np.full(
            len(striped), (seed + int(_P1) + int(_P2)) & _MASK64, dtype=np.uint64
        )
        v2 = np.full(len(striped), (seed + int(_P2)) & _MASK64, dtype=np.uint64)
        v3 = np.full(len(striped), seed & _MASK64, dtype=np.uint64)
        v4 = np.full(len(striped), (seed - int(_P1)) & _MASK64, dtype=np.uint64)
        ns_sub = n_stripes[striped]
        lanes = u64[striped]
        for s in range(max_stripes):
            m = ns_sub > s
            base = s * 4
            v1 = np.where(m, _round(v1, lanes[:, base + 0]), v1)
            v2 = np.where(m, _round(v2, lanes[:, base + 1]), v2)
            v3 = np.where(m, _round(v3, lanes[:, base + 2]), v3)
            v4 = np.where(m, _round(v4, lanes[:, base + 3]), v4)
        merged = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        merged = _merge_round(merged, v1)
        merged = _merge_round(merged, v2)
        merged = _merge_round(merged, v3)
        merged = _merge_round(merged, v4)
        h[striped] = merged
        # Gather each row's <= 31 tail bytes into a dense (n, 32) window.
        off = n_stripes * 32
        tail = mat[np.arange(n)[:, None], off[:, None] + np.arange(32)[None, :]]
        rem = lens - off

    h = h + lens.astype(np.uint64)
    return _tail_mix(h, tail.view("<u8"), rem)


def xxh64_utf8(strings, seed: int = 42) -> np.ndarray:
    """XXH64 of each string's UTF-8 encoding, signed int64 — the exact value
    of Spark's ``xxhash64(col)`` on a string column with the default seed."""
    return xxh64_bytes([s.encode("utf-8") for s in strings], seed)
