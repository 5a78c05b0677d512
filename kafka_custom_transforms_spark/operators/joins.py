"""Temporal join operators: as-of join and interval (range) join.

The reference SMT library has no joins at all (SURVEY.md §2.4 — no join
surface exists in DropField.java / ExtendedHoistField.java /
StructuredSchemalessToJsonString.java); these are engine-surface extension
operators for time-series / event-log workloads, the classic case Spark's
built-in equi-join planner does not cover natively.

Scale design (100 TB):

``asof_join`` never materializes a join at all.  It unions the two inputs
with a side marker and computes ``last(payload IGNORE NULLS)`` over a
key-partitioned, time-ordered window — exactly one hash shuffle on the key,
one sort per partition, zero candidate-pair blowup regardless of how many
right rows precede each left row.  This is strictly cheaper than the
sort-merge range join a naive ``left.ts >= right.ts`` join plans (which
degenerates to per-key cross products), and it is the same plan a
hand-written merge-as-of would produce on a cluster.

``interval_join`` / ``interval_count`` handle the no-equi-key case (join
events to ALL intervals overlapping a time range) with time bucketization:
pick a bucket grain >= the window width, explode each left row to the <= 2
consecutive buckets its window covers, equi-join on the bucket id, then
apply the exact range predicate.  The cross product is bounded by bucket
co-residency instead of |L| x |R|; hot buckets are ordinary equi-join skew
(AQE skew-split applies).  When equi keys DO exist, we pass the range
predicate straight to Catalyst alongside the equi condition so the planner
keeps its hash/sort-merge strategy with the range as a post-filter.
"""

from __future__ import annotations

import warnings
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join", "interval_join", "interval_count"]


def _as_list(x: str | Sequence[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-time (as-of) join: for every left row, attach the payload of
    the nearest right row with the same key and ``right_ts <= left_ts``
    (``direction="backward"``, inclusive) or ``right_ts >= left_ts``
    (``direction="forward"``).  Left rows with no eligible right row get
    nulls (left-join semantics).

    ``right_cols`` selects the right payload columns to attach (default: all
    right columns except the keys; the matched ``right_ts`` is always
    attached as ``{right_ts}{suffix}``).  ``tolerance_us`` additionally
    nulls the payload when the time gap exceeds the given microseconds.

    Determinism: if several right rows share the same (key, right_ts) the
    surviving payload is unspecified — pre-aggregate the right side to one
    row per (key, ts) for a deterministic result (the oracle fixture does).

    Plan shape: union + window aggregate; exactly ONE shuffle (hash on
    ``on``), no join node.  See module docstring for the 100 TB rationale.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _as_list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    else:
        right_cols = list(right_cols)
        missing = [c for c in right_cols if c not in right.columns]
        if missing:
            raise ValueError(f"right_cols not in right: {missing}")
    if right_ts not in right_cols:
        right_cols = [right_ts] + right_cols

    left_payload = [c for c in left.columns if c not in keys and c != left_ts]

    # Pack the right payload into ONE struct so last(..., ignorenulls) pulls
    # every column from the SAME right row even when the right data itself
    # contains nulls in some payload column.
    packed = F.struct(*[F.col(c) for c in right_cols]).alias("_asof_payload")
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        packed,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
    )
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(r_side.schema["_asof_payload"].dataType).alias("_asof_payload"),
        *[F.col(c) for c in left_payload],
    )
    unioned = l_side.unionByName(r_side)

    ts_order = F.col("_asof_ts").asc() if direction == "backward" else F.col("_asof_ts").desc()
    w = (
        Window.partitionBy(*keys)
        # At equal timestamps the right row (side 0) sorts first, so an
        # exactly-coincident right row IS eligible — matches DuckDB ASOF
        # (inclusive >=) and pandas merge_asof(allow_exact_matches=True).
        .orderBy(ts_order, F.col("_asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_asof_payload", ignorenulls=True).over(w)

    out = (
        unioned.withColumn("_asof_match", matched)
        .filter(F.col("_asof_side") == 1)
    )
    if tolerance_us is not None:
        gap = F.abs(
            F.unix_micros(F.col("_asof_ts"))
            - F.unix_micros(F.col(f"_asof_match.{right_ts}"))
        )
        out = out.withColumn(
            "_asof_match",
            F.when(gap <= F.lit(int(tolerance_us)), F.col("_asof_match")),
        )

    proj = [F.col(k) for k in keys]
    proj += [F.col("_asof_ts").alias(left_ts)]
    proj += [F.col(c) for c in left_payload]
    for c in right_cols:
        out_name = f"{c}{suffix}" if (c in keys or c == left_ts or c in left_payload) else c
        proj.append(F.col(f"_asof_match.{c}").alias(out_name))
    return out.select(*proj)


def _bucketize(ts_col: str, grain_us: int) -> F.Column:
    return F.floor(F.unix_micros(F.col(ts_col)) / F.lit(int(grain_us)))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lo_us: int,
    hi_us: int,
    on: str | Sequence[str] | None = None,
    grain_us: int | None = None,
) -> DataFrame:
    """Inner range join: pairs (left row, right row) where
    ``left_ts + lo_us <= right_ts <= left_ts + hi_us`` (microsecond bounds,
    inclusive) and, if ``on`` keys are given, the keys are equal.

    With equi keys the range predicate rides on a normal Catalyst equi-join.
    Without keys, time bucketization (see module docstring) keeps the plan an
    equi-join on bucket id instead of a cartesian/range join.  Column name
    collisions between the two inputs are the caller's to resolve (select /
    alias first), mirroring ``DataFrame.join``.
    """
    if hi_us < lo_us:
        raise ValueError(f"hi_us {hi_us} < lo_us {lo_us}")
    # Epoch-us helper columns are materialized PER SIDE before the join so
    # the range predicate never references a timestamp by bare name across
    # the join — with the natural same-name case (left 'ts' vs right 'ts')
    # an unqualified F.col would raise AMBIGUOUS_REFERENCE, and self-derived
    # inputs can hit Spark's self-join resolution trap. Dropped on output.
    l2 = left.withColumn("_ij_l_us", F.unix_micros(F.col(left_ts)))
    r2 = right.withColumn("_ij_r_us", F.unix_micros(F.col(right_ts)))
    in_range = (F.col("_ij_r_us") >= F.col("_ij_l_us") + F.lit(int(lo_us))) & (
        F.col("_ij_r_us") <= F.col("_ij_l_us") + F.lit(int(hi_us))
    )

    if on is not None:
        keys = _as_list(on)
        cond = in_range
        for k in keys:
            cond = cond & (l2[k] == r2[k])
        return l2.join(r2, cond, "inner").drop("_ij_l_us", "_ij_r_us")

    width = hi_us - lo_us
    grain = int(grain_us) if grain_us is not None else max(width, 1)
    if grain < width:
        raise ValueError(f"grain_us {grain} < window width {width}: windows would span >2 buckets")
    lo_b = F.floor((F.col("_ij_l_us") + F.lit(int(lo_us))) / F.lit(grain))
    hi_b = F.floor((F.col("_ij_l_us") + F.lit(int(hi_us))) / F.lit(grain))
    exploded = l2.withColumn("_ij_bucket", F.explode(F.sequence(lo_b, hi_b)))
    r_b = r2.withColumn("_ij_bucket", _bucketize(right_ts, grain))
    return (
        exploded.join(r_b, "_ij_bucket", "inner")
        .filter(in_range)
        .drop("_ij_bucket", "_ij_l_us", "_ij_r_us")
    )


def interval_count(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lo_us: int,
    hi_us: int,
    count_alias: str = "n_in_range",
    grain_us: int | None = None,
) -> DataFrame:
    """Left-semantics range count: every left row, plus how many right rows
    fall in ``[left_ts + lo_us, left_ts + hi_us]`` (0 when none — left rows
    are never lost, unlike an inner ``interval_join`` + groupBy).

    Implementation nulls out-of-range matches instead of filtering rows, so
    a left row whose bucket-join found only out-of-range candidates still
    survives with count 0. The final aggregation groups on a per-row tag
    (``monotonically_increasing_id`` assigned BEFORE the bucket explode),
    not on the left columns: grouping on values would silently collapse
    duplicate left rows into one output row with a summed count, and fails
    outright for non-groupable column types (e.g. map). The tag is assigned
    in the scan stage and is stable within one execution (parquet scans
    replay deterministically on retry); left columns ride through the
    aggregation as ``any_value`` — all rows in a group carry the identical
    left row, so the choice is deterministic.
    """
    if hi_us < lo_us:
        raise ValueError(f"hi_us {hi_us} < lo_us {lo_us}")
    width = hi_us - lo_us
    grain = int(grain_us) if grain_us is not None else max(width, 1)
    if grain < width:
        raise ValueError(f"grain_us {grain} < window width {width}: windows would span >2 buckets")

    tagged = left.withColumn("_ij_row_id", F.monotonically_increasing_id())
    l_us = F.unix_micros(F.col(left_ts))
    lo_b = F.floor((l_us + F.lit(int(lo_us))) / F.lit(grain))
    hi_b = F.floor((l_us + F.lit(int(hi_us))) / F.lit(grain))
    # explode_outer, not explode: a left row with a NULL timestamp has a
    # null bucket sequence, and plain explode would drop it entirely —
    # violating the "left rows are never lost" contract. With the outer
    # variant it survives with a null bucket, matches nothing, and exits
    # with count 0.
    exploded = tagged.withColumn("_ij_bucket", F.explode_outer(F.sequence(lo_b, hi_b)))

    r_b = right.select(
        _bucketize(right_ts, grain).alias("_ij_bucket"),
        F.unix_micros(F.col(right_ts)).alias("_ij_r_us"),
    )
    j = exploded.join(r_b, "_ij_bucket", "left")
    in_range = (
        F.col("_ij_r_us").isNotNull()
        & (F.col("_ij_r_us") >= F.unix_micros(F.col(left_ts)) + F.lit(int(lo_us)))
        & (F.col("_ij_r_us") <= F.unix_micros(F.col(left_ts)) + F.lit(int(hi_us)))
    )
    return (
        j.groupBy("_ij_row_id")
        .agg(
            *[F.any_value(F.col(c)).alias(c) for c in left.columns],
            F.sum(F.when(in_range, 1).otherwise(0)).cast("long").alias(count_alias),
        )
        .drop("_ij_row_id")
    )


def bloom_filtered_join(
    spark,
    app: DataFrame,
    creation: DataFrame,
    app_key: str,
    creation_key: str,
    *,
    app_scan_threshold: str = "1KB",
    require_injection: bool = True,
    dry_run: bool = False,
) -> DataFrame:
    """Shuffle join executed with RUNTIME bloom-filter pushdown
    (InjectRuntimeFilter): the selective ``creation`` side builds a bloom
    filter over its join keys as a subquery aggregate, and Catalyst
    injects ``might_contain`` into the ``app`` side's scan filter — the
    fact table drops non-joining rows BEFORE the shuffle instead of
    shipping them to the join. Semantics-neutral (a bloom filter only
    false-positives), so any oracle is the plain join.

    At 100 TB this is the difference between shuffling the whole fact
    table and shuffling the ~selectivity fraction that can actually join.
    Prerequisites (why these scoped confs): the default
    applicationSideScanSizeThreshold (10GB) assumes cluster-scale facts —
    scoped down for test corpora; broadcast is disabled because a
    broadcast join never shuffles the fact side and Catalyst skips
    injection for it.

    The join EXECUTES inside this call (localCheckpoint) so optimization
    happens under the scoped confs; the optimized plan that ran is
    attached as ``.bloom_optimized_plan``. With ``require_injection=True``
    (the test/bench mode) non-injection raises — a silent non-injection is
    a pipeline regression there. Callers on the correctness path pass
    ``require_injection=False`` and read ``.bloom_injected`` instead: the
    injection decision depends on absolute size thresholds and optimizer
    heuristics that shift with scale factor, compression, and Spark
    version, and a declined optimization is still the CORRECT (just
    slower) plain join — degrading beats aborting the run.

    ``dry_run=True`` stops after the optimizer probe: the returned frame
    is the UNEXECUTED join (no localCheckpoint) carrying
    ``.bloom_injected`` / ``.bloom_optimized_plan``, so callers can test
    whether a threshold injects for the cost of one plan analysis and
    only execute the variant they keep (r10 advice: the retry ladder
    previously ran the full join once per declined attempt). Inspect
    only — don't collect a dry-run frame: it would re-optimize OUTSIDE
    the scoped confs, so the executed plan could differ from the probe.
    """
    from kafka_custom_transforms_spark.functions.skew import scoped_conf

    settings = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": app_scan_threshold,
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    with scoped_conf(spark, settings):
        joined = app.join(creation, app[app_key] == creation[creation_key])
        plan = joined._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
        injected = "bloom_filter_agg" in plan
        if not injected and require_injection:
            raise AssertionError(
                "runtime bloom filter was not injected — check thresholds/join shape"
            )
        if not injected and not dry_run:
            warnings.warn(
                "bloom_filtered_join: runtime bloom filter was not injected; "
                "executing the plain join (correct, unpruned)",
                stacklevel=2,
            )
        out = joined if dry_run else joined.localCheckpoint(eager=True)
    out.bloom_optimized_plan = plan
    out.bloom_injected = injected
    return out
