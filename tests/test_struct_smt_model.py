"""Randomized model test for the schema'd DropField path: hundreds of
random nested rows and random drop-path sets compared against an
independent Python model of the reference semantics (DropField.java:84-119
— drop by dotted path, descend STRUCT only, keep empty structs, null
structs stay null). Seeded, so failures replay. Complements the
JSON-side hypothesis tests (test_property_json.py) on the schema'd
representation."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kafka_custom_transforms_spark import drop_fields

SCHEMA = (
    "a int, b struct<c:int, d:struct<e:string, f:int>, g:string>, h string"
)

ALL_PATHS = ["a", "h", "b", "b.c", "b.g", "b.d", "b.d.e", "b.d.f"]


def _rand_row(rng: random.Random):
    def maybe(v):
        return None if rng.random() < 0.3 else v

    d = maybe({"e": maybe("s" + str(rng.randint(0, 9))), "f": maybe(rng.randint(0, 99))})
    b = maybe({"c": maybe(rng.randint(0, 99)), "d": d, "g": maybe("g" + str(rng.randint(0, 9)))})
    return {"a": maybe(rng.randint(0, 99)), "b": b, "h": maybe("h" + str(rng.randint(0, 9)))}


def _model(obj, prefix, dropset):
    """Reference semantics on plain dicts: remove matched paths, recurse
    into dict values, None stays None, empty dicts survive."""
    if obj is None or not isinstance(obj, dict):
        return obj
    out = {}
    for k, v in obj.items():
        p = prefix + k
        if p in dropset:
            continue
        out[k] = _model(v, p + ".", dropset) if isinstance(v, (dict, type(None))) else v
    return out


def test_random_rows_and_paths_match_model(spark):
    rng = random.Random(42)
    rows = [_rand_row(rng) for _ in range(40)]
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], f"i long, rec struct<{SCHEMA}>"
    )
    for trial in range(6):
        k = rng.randint(1, 4)
        paths = sorted(rng.sample(ALL_PATHS, k))
        op = drop_fields(paths, target="rec")
        got = {
            r["i"]: r["rec"].asDict(recursive=True) if r["rec"] is not None else None
            for r in op(df).collect()
        }
        for i, r in enumerate(rows):
            want = _model(r, "", set(paths))
            # the model removes keys; Spark's struct keeps the pruned
            # schema's keys with None for absent parents — normalize by
            # comparing only kept keys recursively
            assert _eq(got[i], want), (trial, paths, i, got[i], want)


def _eq(spark_val, model_val):
    if model_val is None or spark_val is None:
        return spark_val == model_val
    if isinstance(model_val, dict):
        if not isinstance(spark_val, dict):
            return False
        if set(spark_val) != set(model_val):
            return False
        return all(_eq(spark_val[k], model_val[k]) for k in model_val)
    return spark_val == model_val
