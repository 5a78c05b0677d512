"""Data-contract validation: declarative quality gates over a DataFrame.

A pipeline promoting data between zones (raw -> clean -> training) gates
each hop on a contract: typed rules whose violations are counted (and
optionally sampled) per rule. Rules compile to ONE aggregation pass over
the table (every predicate a conditional count — map-side partials, no
per-rule scans), plus one anti join per foreign-key rule and one grouped
pass per uniqueness rule. At 100 TB the single-scan property is the
difference between a contract and k full table reads.

Rule types:
  - ``not_null``: column must be non-null
  - ``range``: numeric column within [lo, hi] (either bound optional)
  - ``regex``: string column must match (nulls count as violations)
  - ``unique``: no key occurs twice
  - ``foreign_key``: every value must exist in the reference table's column

No reference counterpart (driver-mandated extension class; the reference
is 3 Kafka SMTs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    column: str
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    ref: object = None  # DataFrame for foreign_key
    ref_column: str | None = None
    keys: tuple[str, ...] = field(default_factory=tuple)
    broadcast_ref: bool | None = None  # None = size-based auto


def not_null(name: str, column: str) -> Rule:
    return Rule(name, "not_null", column)


def in_range(name: str, column: str, lo: float | None = None, hi: float | None = None) -> Rule:
    return Rule(name, "range", column, lo=lo, hi=hi)


def matches(name: str, column: str, pattern: str) -> Rule:
    return Rule(name, "regex", column, pattern=pattern)


def unique(name: str, *keys: str) -> Rule:
    if not keys:
        raise ValueError(f"unique rule {name!r} needs at least one key column")
    return Rule(name, "unique", keys[0], keys=tuple(keys))


def foreign_key(
    name: str,
    column: str,
    ref: DataFrame,
    ref_column: str,
    broadcast_ref: bool | None = None,
) -> Rule:
    """``broadcast_ref``: True forces a broadcast anti join (right for dim
    tables), False leaves the strategy to Catalyst/AQE (right for large
    references, where a forced broadcast would exceed the broadcast limit
    or OOM the driver at the module's 100 TB design point), None (default)
    broadcasts only when the reference's plan statistics put it under
    ``spark.sql.autoBroadcastJoinThreshold``."""
    return Rule(
        name,
        "foreign_key",
        column,
        ref=ref,
        ref_column=ref_column,
        broadcast_ref=broadcast_ref,
    )


def _fits_broadcast(ref: DataFrame) -> bool:
    """True when the optimizer's size estimate for the reference plan is
    under spark.sql.autoBroadcastJoinThreshold — the same evidence AQE
    would use, read here so the explicit hint is only attached when it is
    provably safe. Falls back to False (no hint) on any estimation error."""
    try:
        raw = str(
            ref.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        ).strip().lower()
        units = {"b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
                 "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}
        num = raw.rstrip("bkmg")
        threshold = int(num) * units.get(raw[len(num):], 1)
        if threshold <= 0:
            return False
        size = (
            ref._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        return int(size.toString()) <= threshold
    except Exception:
        return False


def _violation_cond(r: Rule):
    c = F.col(r.column)
    if r.kind == "not_null":
        return c.isNull()
    if r.kind == "range":
        cond = F.lit(False)
        if r.lo is not None:
            cond = cond | (c < F.lit(r.lo))
        if r.hi is not None:
            cond = cond | (c > F.lit(r.hi))
        return c.isNull() | cond
    if r.kind == "regex":
        return c.isNull() | ~c.rlike(r.pattern)
    raise ValueError(f"unsupported inline rule kind {r.kind}")


def validate_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, n_violations) per rule. Inline rules (not_null/range/regex)
    share ONE aggregation pass; unique adds one grouped pass per key set;
    foreign_key adds one anti join per reference (broadcast when the
    reference is a dim). The output is a SET keyed by rule name (inline
    rules surface first, then unique/FK in list order) — join or map on
    ``rule``, never on row position."""
    if not rules:
        raise ValueError("validate_rules: empty rules list")
    known = {"not_null", "range", "regex", "unique", "foreign_key"}
    for r in rules:
        if r.kind not in known:
            raise ValueError(f"validate_rules: unknown rule kind {r.kind!r}")
    inline = [r for r in rules if r.kind in ("not_null", "range", "regex")]
    parts: list[DataFrame] = []
    if inline:
        # coalesce(..., 0): SUM over zero rows is NULL, so without it an
        # empty input reports n_violations = NULL for inline rules while
        # unique/foreign_key report 0 — a `== 0` gate would fail closed
        # and the output would be inconsistent across rule kinds.
        agg = df.agg(
            *[
                F.coalesce(F.sum(_violation_cond(r).cast("long")), F.lit(0))
                .cast("long")
                .alias(r.name)
                for r in inline
            ]
        )
        stacked = agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r.name).alias("rule"),
                            F.col(r.name).alias("n_violations"),
                        )
                        for r in inline
                    ]
                )
            ).alias("kv")
        ).select("kv.rule", "kv.n_violations")
        parts.append(stacked)
    for r in rules:
        if r.kind == "unique":
            dups = (
                df.groupBy(*r.keys)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            parts.append(dups)
        elif r.kind == "foreign_key":
            ref = r.ref.select(F.col(r.ref_column).alias(r.column)).distinct()
            # Broadcast only when the rule says so or the reference is
            # provably small; a forced broadcast of a large reference
            # relation fails the job at scale (advisor r3). With no hint
            # and no small-size evidence, leave the strategy to AQE.
            if r.broadcast_ref is True:
                ref = F.broadcast(ref)
            elif r.broadcast_ref is None and _fits_broadcast(r.ref):
                ref = F.broadcast(ref)
            orphans = (
                df.select(r.column)
                .filter(F.col(r.column).isNotNull())
                .join(ref, r.column, "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
