"""Property-based tests (hypothesis): the JSON schemaless paths of
drop_fields / hoist_field against independent pure-Python models, over
arbitrary nested JSON objects."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from kafka_custom_transforms_spark import drop_fields, hoist_field

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
