"""Property-based tests (hypothesis): the JSON schemaless paths of
drop_fields / hoist_field / to_json_string against independent pure-Python
models, over arbitrary nested JSON objects and typed maps."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from kafka_custom_transforms_spark import (
    drop_fields,
    hoist_field,
    to_json_string,
    transform_chain,
)

KEYS = st.sampled_from(["k1", "k2", "parent", "child", "x"])
SCALARS = st.one_of(st.none(), st.integers(-1000, 1000), st.text(max_size=8))
JSON_OBJS = st.recursive(
    st.dictionaries(KEYS, SCALARS, max_size=3),
    lambda inner: st.dictionaries(KEYS, st.one_of(SCALARS, inner, st.lists(SCALARS, max_size=2)), max_size=3),
    max_leaves=6,
)
PATHS = st.lists(
    st.one_of(
        KEYS,
        st.tuples(KEYS, KEYS).map(".".join),
        st.tuples(KEYS, KEYS, KEYS).map(".".join),
    ),
    max_size=3,
)


def _model_drop(obj, prefix, dropset):
    if not isinstance(obj, dict):
        return obj
    out = {}
    for k, v in obj.items():
        p = prefix + k
        if p in dropset:
            continue
        out[k] = _model_drop(v, p + ".", dropset) if isinstance(v, dict) else v
    return out


def _model_hoist(obj, field, keep):
    root = {k: v for k, v in obj.items() if k in keep}
    inner = {k: v for k, v in obj.items() if k not in keep}
    if inner:
        root[field] = inner
    return root


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(objs=st.lists(JSON_OBJS, min_size=1, max_size=5), paths=PATHS)
def test_json_drop_matches_model(spark, objs, paths):
    df = spark.createDataFrame([(json.dumps(o),) for o in objs], "value string")
    got = [json.loads(r.value) for r in drop_fields(paths)(df).collect()]
    want = [_model_drop(o, "", set(paths)) for o in objs]
    assert got == want


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(objs=st.lists(JSON_OBJS, min_size=1, max_size=5))
def test_json_hoist_partition_matches_model(spark, objs):
    keep = ["k1", "parent"]
    df = spark.createDataFrame([(json.dumps(o),) for o in objs], "value string")
    got = [json.loads(r.value) for r in hoist_field("magic", keep)(df).collect()]
    want = [_model_hoist(o, "magic", set(keep)) for o in objs]
    assert got == want


# ---- to_json_string (J1/J3, StructuredSchemalessToJsonString.java:45-62) ----
# Model: Jackson writeValueAsString on a Map is round-trippable JSON of the
# same entries — so json.loads(Spark to_json(m)) must equal the input dict
# exactly (nulls preserved, unicode/control chars escaped losslessly).

MAP_KEYS = st.text(
    st.characters(codec="utf-8", exclude_characters="\x00"), min_size=1, max_size=6
)
STR_VALS = st.one_of(
    st.none(), st.text(st.characters(codec="utf-8", exclude_characters="\x00"), max_size=10)
)
LONG_LISTS = st.one_of(st.none(), st.lists(st.one_of(st.none(), st.integers(-(2**62), 2**62)), max_size=4))
INNER_MAPS = st.one_of(st.none(), st.dictionaries(MAP_KEYS, st.one_of(st.none(), st.integers(-(2**62), 2**62)), max_size=3))


def _roundtrip(spark, rows, ddl):
    df = spark.createDataFrame([(m,) for m in rows], f"value {ddl}")
    out = to_json_string()(df).collect()
    return [None if r.value is None else json.loads(r.value) for r in out]


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(maps=st.lists(st.dictionaries(MAP_KEYS, STR_VALS, max_size=4), min_size=1, max_size=4))
def test_to_json_string_map_roundtrips_exactly(spark, maps):
    assert _roundtrip(spark, maps, "map<string,string>") == maps


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(maps=st.lists(st.dictionaries(MAP_KEYS, LONG_LISTS, max_size=3), min_size=1, max_size=3))
def test_to_json_string_array_values_roundtrip(spark, maps):
    assert _roundtrip(spark, maps, "map<string,array<bigint>>") == maps


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(maps=st.lists(st.dictionaries(MAP_KEYS, INNER_MAPS, max_size=3), min_size=1, max_size=3))
def test_to_json_string_nested_map_roundtrips(spark, maps):
    assert _roundtrip(spark, maps, "map<string,map<string,bigint>>") == maps


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.one_of(st.none(), st.integers(-(2**62), 2**62)), min_size=1, max_size=5))
def test_to_json_string_non_map_passthrough_identity(spark, vals):
    # J3: schemaless non-Map values are returned untouched (:61)
    df = spark.createDataFrame([(v,) for v in vals], "value bigint")
    assert [r.value for r in to_json_string()(df).collect()] == vals


# ---- transform chain (Connect `transforms=a,b,c`, README.md:13-15) ----
# The deployed configuration is a CHAIN, not a single transform; pin that
# composing drop -> hoist -> to_json on the JSON path equals composing the
# pure-Python models (each operator must emit valid input for the next;
# to_json_string is the J3 passthrough on an already-string column).


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(objs=st.lists(JSON_OBJS, min_size=1, max_size=5), paths=PATHS)
def test_json_chain_matches_composed_models(spark, objs, paths):
    keep = ["k1", "parent"]
    chain = transform_chain(drop_fields(paths), hoist_field("magic", keep), to_json_string())
    df = spark.createDataFrame([(json.dumps(o),) for o in objs], "value string")
    got = [json.loads(r.value) for r in chain(df).collect()]
    want = [
        _model_hoist(_model_drop(o, "", set(paths)), "magic", set(keep)) for o in objs
    ]
    assert got == want
