"""Tokenization, shingling, and deterministic hashing expressions.

Two hash families, chosen per use:
  - ``xxhash64`` (Spark built-in): the hot path for MinHash permutations and
    LSH band hashes. Fast, JVM-only; correctness of the operators using it is
    established by *exact verification* of candidates, so the oracle never
    needs to reproduce xxhash64.
  - md5-prefix (``conv(substr(md5(x),1,15),16,10)`` -> 60-bit non-negative
    bigint): bit-identical in Spark and DuckDB (verified), used wherever the
    DuckDB oracle must recompute the same hash (SimHash, fingerprinting).

ANSI-mode care (Spark 4 default): all modular arithmetic is kept below 2^62
so bigint multiplication never overflows; ``sequence()`` is guarded so a
short document can't produce a descending sequence.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints under future-annotations
from pyspark.sql import Column, functions as F

# Mersenne prime 2^31-1: keeps a*h+b < 2^62 under ANSI overflow checking.
MERSENNE_P = 2_147_483_647


def tokens(text: Column) -> Column:
    """Whitespace tokens. Single-space split matches the oracle's
    string_split; use ``tokens_re`` for real-world text."""
    return F.split(text, " ")


def tokens_re(text: Column) -> Column:
    """BPE-ish tokenizer: words, numbers, or single punctuation marks."""
    return F.regexp_extract_all(text, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), 0)


def word_shingles(toks: Column, k: int) -> Column:
    """Distinct k-word shingles. Documents shorter than k words yield an
    empty array (guarded: Spark's sequence(1, 0) would be descending)."""
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.when(n >= k, F.array_distinct(windows)).otherwise(
        F.array().cast("array<string>")
    )


def md5_hash60(s: Column) -> Column:
    """60-bit non-negative bigint from the md5 prefix — bit-identical to
    DuckDB's ('0x' || substr(md5(s), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def md5_hash56(s: Column, part: int = 0) -> Column:
    """56-bit non-negative bigint from md5 hex chars [1+14*part, 14+14*part]
    — bit-identical to DuckDB's
    ('0x' || substr(md5(s), 1 + 14*part, 14))::BIGINT.

    One md5 call yields 128 bits = two independent 56-bit longs (parts 0/1)
    — half the hashing cost of salted re-hashing for multi-long signatures.
    14 hex chars = 56 bits keeps 8-bit slice boundaries exact (56 = 7 x 8)
    and the value comfortably inside a signed bigint."""
    if part not in (0, 1):
        raise ValueError("md5 yields 32 hex chars: part must be 0 or 1")
    return F.conv(F.substring(F.md5(s), 1 + 14 * part, 14), 16, 10).cast("long")


def minhash_perms(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family
    h_j(x) = (a_j * x + b_j) mod p, a_j in [1, p)."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(num_perm)]


def shingle_hashes(shingles: Column) -> Column:
    """Base hashes of each shingle, reduced into [0, p)."""
    return F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_P)))


def minhash_signature(shingles: Column, perms: list[tuple[int, int]]) -> Column:
    """Array of num_perm minima as a single per-row expression.

    NOTE: fine up to ~32 permutations; beyond that the generated code for the
    nested lambdas exceeds the JIT/codegen budget and Catalyst falls back to
    interpreted evaluation (~100x slower). Operators default to
    ``minhash_signature_map`` (JVM base hashes + numpy mod-min, shuffle-free)
    for the full-width signature, with ``minhash_signature_agg`` (explode +
    128 independent min-aggregates) as the Python-worker-free fallback —
    both bit-identical to this expression form (test-pinned).
    """
    base = shingle_hashes(shingles)
    perms_lit = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in perms
        ]
    )
    return F.transform(
        perms_lit,
        lambda ab: F.array_min(
            F.transform(base, lambda x: F.pmod(ab.a * x + ab.b, F.lit(MERSENNE_P)))
        ),
    )


def minhash_signature_agg(
    sets,  # DataFrame with (id, sh) columns
    perms: list[tuple[int, int]],
    id_col: str = "id",
    shingle_col: str = "sh",
):
    """(id, sig) via explode + per-permutation min aggregates.

    The classic MinHash plan for large corpora: the explode produces
    |docs| x |shingles| narrow rows, map-side partial aggregation collapses
    them to one 128-long row per (partition, id) before the single shuffle
    on id. CAVEAT (measured, r8): the stage IS whole-stage-codegen'd
    (final adaptive plan shows the `*(n)` markers), but at num_perm=128
    the per-row cost measures ~0.25us per min-term — interpreter-range,
    consistent with the generated consume() exceeding the JVM's
    huge-method JIT limit: 27k exploded rows took 1.3-1.6s warm where
    JIT'd arithmetic would take ~10ms. ``minhash_signature_map`` avoids
    the question entirely (and the shuffle) and is the operators'
    default; this form remains for Python-worker-free clusters.
    """
    p = F.lit(MERSENNE_P)
    exploded = sets.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hashes(F.col(shingle_col))).alias("h"),
    )
    mins = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), p)).alias(f"m{j}")
        for j, (a, b) in enumerate(perms)
    ]
    agged = exploded.groupBy("id").agg(*mins)
    return agged.select("id", F.array(*[F.col(f"m{j}") for j in range(len(perms))]).alias("sig"))


def minhash_signature_map(
    sets,  # DataFrame with (id, sh) columns
    perms: list[tuple[int, int]],
    id_col: str = "id",
    shingle_col: str = "sh",
    base_hashes=shingle_hashes,
    input_nonempty: bool = False,
):
    """(id, sig) as a pure per-doc MAP — no explode, no shuffle.

    Base hashes stay JVM-side (``base_hashes`` builds the array<long> from
    the shingle array — xxhash64 by default, md5-derived for the
    oracle-replayable store pipeline), so hash bit-parity with the SQL
    oracle is untouched; only the (n_shingles x num_perm) mod-min
    reduction moves into one numpy pass per Arrow batch. Bit-identical to
    :func:`minhash_signature_agg` (pinned in tests/test_dedup.py), but:

      - the agg form's 128 min-aggregates generate a method so large the
        JIT never compiles it, so the per-row work runs at bytecode-
        interpreter speed (~1.4 s for 27k exploded rows measured at
        sf0.001 — pure fixed overhead; see the agg docstring);
      - the agg form needs explode (50x row amplification before map-side
        partials) + one hash shuffle on id; this form needs neither — the
        signature stage becomes embarrassingly parallel at any scale.

    Rows with empty shingle sets are dropped, matching the agg form
    (explode of an empty array emits no rows, so groupBy never sees the
    id).

    ``input_nonempty=True`` declares every input row already has a
    non-empty shingle set (true by construction for ``shingle_sets``
    output: only docs with >= k tokens survive, and those always shingle
    to >= 1 window) and skips the empty-set filter. Plan rationale (r15
    optimization, guide §4.4): on an UN-checkpointed Arrow-shingler
    input, Catalyst pushes ``size(sh) > 0`` below the projection by
    duplicating the shingle UDF, shingling every document twice — see
    ``dedup.simhash_signatures_wide_map`` for the measured effect.
    Results are identical on inputs honoring the declaration."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    a_list = [ab[0] for ab in perms]
    b_list = [ab[1] for ab in perms]

    @pandas_udf("array<long>")
    def _sig(hs: pd.Series) -> pd.Series:
        av = np.asarray(a_list, dtype=np.int64)
        bv = np.asarray(b_list, dtype=np.int64)
        out = []
        # Deliberately a per-document loop (r16 NEGATIVE A/B, pinned): a
        # batch-flattened chunked ``minimum.reduceat`` over the whole
        # Arrow batch is bit-identical but ~2x SLOWER — numpy's reduceat
        # has no SIMD fast path, while the ~(50-100 x num_perm) per-doc
        # matrices here are small enough that the vectorized min(axis=0)
        # dominates the per-call overhead (0.30 vs 0.57 s per 3k docs
        # measured standalone; 0.78 vs 1.83 s sig stage at a 20x corpus
        # replica, interleaved idle).
        for h in hs:
            hv = np.asarray(h, dtype=np.int64)
            # hv < p and av < p, so hv*av < 2^62 stays inside int64; numpy
            # % on non-negative operands equals Spark's pmod. The agg form
            # would fail loudly under ANSI overflow on a non-reduced base;
            # numpy would wrap silently, so enforce the precondition here.
            if hv.size and (hv.max() >= MERSENNE_P or hv.min() < 0):
                raise ValueError(
                    "minhash_signature_map: base_hashes must emit values "
                    "already reduced into [0, MERSENNE_P); got a value "
                    "outside that range"
                )
            out.append(((hv[:, None] * av + bv) % MERSENNE_P).min(axis=0))
        return pd.Series(out)

    hashed = (
        (sets if input_nonempty else sets.filter(F.size(F.col(shingle_col)) > 0))
        .select(F.col(id_col).alias("id"), base_hashes(F.col(shingle_col)).alias("hs"))
    )
    return hashed.select("id", _sig(F.col("hs")).alias("sig"))


def minhash_signature_map_fused(
    sets,  # DataFrame with (id, sh) columns
    perms: list[tuple[int, int]],
    id_col: str = "id",
    shingle_col: str = "sh",
    input_nonempty: bool = False,
):
    """(id, sig) in ONE Arrow pass: XXH64 base hashes + mod-min in numpy.

    Bit-identical to ``minhash_signature_map`` with the default xxhash64
    ``base_hashes`` (test-pinned): :mod:`..functions.xxh64_np` reproduces
    Spark's ``xxhash64`` exactly, so the hash family — and therefore every
    LSH band collision downstream — is unchanged. The per-gram base hash
    leaves the interpreted ``transform(sh, s -> pmod(xxhash64(s), p))``
    higher-order function and fuses with the mod-min reduction into a
    single ``mapInArrow`` pass that reads the gram bytes straight from
    the Arrow values buffer — no per-gram Python string objects, no
    second JVM->Python crossing.

    MEASURED NEGATIVE (r16, pinned — the split form stays the production
    default): sf0.1 sig stage 0.338 (split) vs 0.332 s (wash) and a 20x
    replica 0.77 vs 1.07 s (interleaved, idle, fused loses every pair).
    Spark's xxhash64 is a fast native intrinsic even inside the
    interpreted HOF, and this fusion trades the split form's 8 B/gram
    *long* crossing for a ~25 B/gram *string* crossing — more Arrow bytes
    than the HOF costs. Kept (with its Spark-parity test pins) because
    the trade flips wherever the gram strings must cross the boundary
    anyway or the JVM is not available to hash; the reduceat mod-min
    this kernel introduced now also powers ``minhash_signature_map``.

    Contract: shingle arrays and their elements must be non-null
    (``shingle_sets`` output satisfies both); rows reaching the kernel
    must have non-empty shingle sets (``input_nonempty=True`` asserts the
    caller guarantees it, otherwise a JVM-side size filter is applied
    first, exactly as in ``minhash_signature_map``).
    """
    import numpy as np

    a_np = np.asarray([ab[0] for ab in perms], dtype=np.int64)
    b_np = np.asarray([ab[1] for ab in perms], dtype=np.int64)
    num_perm = len(perms)

    src = sets if input_nonempty else sets.filter(F.size(F.col(shingle_col)) > 0)
    proj = src.select(F.col(id_col).alias("id"), F.col(shingle_col).alias("sh"))
    id_type = proj.schema["id"].dataType.simpleString()

    def _fused(batches):
        import numpy as np
        import pyarrow as pa

        from kafka_custom_transforms_spark.functions.xxh64_np import (
            _xxh64_mat,
            xxh64_short,
        )

        # Keep the (grams x num_perm) permutation matrix cache-resident:
        # 2^13 grams x 128 perms x 8 B = 8 MB per reduceat chunk (measured
        # 1.4x faster than a 64 MB chunk — the three passes over the
        # chunk run from L2/L3 instead of DRAM).
        chunk_grams = 1 << 13

        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            ids = batch.column(0)
            sh = batch.column(1)
            flat = sh.values
            if sh.null_count or flat.null_count:
                raise ValueError(
                    "minhash_signature_map_fused: null shingle arrays/"
                    "elements are outside the shingle_sets contract"
                )
            # List offsets -> logical gram index range of this batch
            # (buffers are shared across slices; account for .offset).
            lo = np.frombuffer(
                sh.buffers()[1], dtype="<i4", count=len(sh) + 1 + sh.offset
            )[sh.offset :].astype(np.int64)
            g0, g1 = int(lo[0]), int(lo[-1])
            counts = np.diff(lo)
            if counts.min() <= 0:
                raise ValueError(
                    "minhash_signature_map_fused: empty shingle set reached "
                    "the fused kernel (caller must filter or declare "
                    "input_nonempty only when true)"
                )
            off_dtype = "<i8" if pa.types.is_large_string(flat.type) else "<i4"
            so = np.frombuffer(
                flat.buffers()[1], dtype=off_dtype, count=len(flat) + 1 + flat.offset
            )[flat.offset :].astype(np.int64)
            data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
            gl = so[g0 + 1 : g1 + 1] - so[g0 : g1]  # per-gram byte lengths
            n_grams = g1 - g0

            # Hash the gram bytes IN PLACE in the Arrow values buffer when
            # every gram is < 32 bytes (virtually always for word
            # shingles): xxh64_short gathers each gram's 32-byte window
            # straight from the shared buffer — no padded matrix, no
            # scatter, garbage past each gram's length is never read into
            # the result. Long grams fall back to the padded-matrix path.
            max_len = int(gl.max())
            if max_len < 32:
                if data.size < int(so[g1]) + 31:
                    data = np.concatenate([data, np.zeros(32, dtype=np.uint8)])
                hv = xxh64_short(data, so[g0:g1], gl, 42)
            else:
                width = ((max_len + 31) // 32) * 32 + 32
                mat = np.zeros((n_grams, width), dtype=np.uint8)
                mat[np.arange(width)[None, :] < gl[:, None]] = data[
                    int(so[g0]) : int(so[g1])
                ]
                hv = _xxh64_mat(mat, gl, 42)
            hv = hv % MERSENNE_P  # floored == Spark pmod

            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            sig = np.empty((n, num_perm), dtype=np.int64)
            d0 = 0
            gbase = 0
            while d0 < n:
                d1 = d0 + 1
                g = int(counts[d0])
                while d1 < n and g + counts[d1] <= chunk_grams:
                    g += int(counts[d1])
                    d1 += 1
                big = hv[gbase : gbase + g, None] * a_np
                big += b_np
                big %= MERSENNE_P
                sig[d0:d1] = np.minimum.reduceat(big, starts[d0:d1] - gbase, axis=0)
                gbase += g
                d0 = d1

            sig_col = pa.ListArray.from_arrays(
                pa.array(
                    np.arange(0, (n + 1) * num_perm, num_perm, dtype=np.int32)
                ),
                pa.array(sig.ravel()),
            )
            yield pa.RecordBatch.from_arrays([ids, sig_col], ["id", "sig"])

    return proj.mapInArrow(_fused, schema=f"id {id_type}, sig array<bigint>")


def band_hashes(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Array of (band, hash) structs: hash of each signature slice. Banding
    turns near-duplicate detection into an equi-join on (band, hash) — the
    shuffle key is uniform by construction, so no skew at scale.

    Deliberately the higher-order-function form, NOT a statically
    unrolled array (measured r10, interleaved A/B on the full
    minhash_lsh query at sf0.1): the unrolled 32-band expression tree
    (~400 nodes, duplicated across both self-join sides) pays plan
    analysis + codegen on EVERY fresh query construction — 1.82 s vs
    3.23 s medians end-to-end — even though a reused-plan microbench
    shows the unrolled bucket STAGE 2x faster per row. A direct
    xxhash64-on-longs variant lost the same way (2.20 vs 3.25 s). The
    per-row interpreter cost here is ~1 us x bands per doc — never the
    banded pipeline's bottleneck (the band JOIN is); re-visit with a
    size-dispatched unroll (the similarity.UNROLL_MIN_ROWS pattern) only
    if a profiled corpus shows this stage dominating."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.concat_ws(",", F.transform(F.slice(sig, b * rows_per_band + 1, rows_per_band), lambda x: x.cast("string"))),
                b,
            ).alias("bh"),
        ),
    )
