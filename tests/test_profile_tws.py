"""transformWithState profile operator: pure-logic tests plus the
environment-guard contract.

The TWS wire protocol needs google.protobuf in the worker (absent in this
container — see streaming/profile_tws.py docstring), so the processor is
exercised directly: its fold arithmetic, its state round-trip through a
fake ValueState, and its emission shape. The batch equivalence test pins
that folding arbitrary chunkings of a keyed stream reproduces the batch
groupBy aggregate exactly — the convergence contract the streaming run
relies on.
"""

from __future__ import annotations

import pandas as pd
import pytest

from kafka_custom_transforms_spark.streaming import profile_tws


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        assert schema == "n_events long, total_value double, max_ts_us long"
        return self.states.setdefault(name, _FakeValueState())


def _chunks(rows, sizes):
    out, i = [], 0
    for s in sizes:
        out.append(pd.DataFrame(rows[i : i + s], columns=["value", "ts_us"]))
        i += s
    assert i == len(rows)
    return out


def test_fold_matches_batch_aggregate_under_any_chunking():
    rows = [(2.0, 10), (3.5, 5), (1.0, 40), (0.25, 39)]
    expected = (4, 6.75, 40)
    for sizes in ([4], [1, 1, 1, 1], [2, 2], [3, 1]):
        st = None
        for pdf in _chunks(rows, sizes):
            st = profile_tws._fold(st, pdf)
        assert st == expected, sizes


def test_fold_empty_chunk_is_identity():
    st = (3, 1.5, 99)
    out = profile_tws._fold(st, pd.DataFrame({"value": [], "ts_us": []}))
    assert out == st


def test_processor_accumulates_across_batches_via_state():
    proc = profile_tws.make_profile_processor()
    handle = _FakeHandle()
    proc.init(handle)
    b1 = pd.DataFrame({"value": [2.0, 3.0], "ts_us": [10, 20]})
    out1 = list(proc.handleInputRows((7,), iter([b1]), None))
    b2 = pd.DataFrame({"value": [5.0], "ts_us": [15]})
    out2 = list(proc.handleInputRows((7,), iter([b2]), None))
    proc.close()
    assert len(out1) == 1 and len(out2) == 1
    r1, r2 = out1[0].iloc[0], out2[0].iloc[0]
    assert (r1["key"], r1["n_events"], r1["total_value"], r1["max_ts_us"]) == (
        7, 2, 5.0, 20,
    )
    # second batch folds ON TOP of persisted state: counts accumulate and
    # the earlier max (20) survives the later batch's smaller ts (15)
    assert (r2["key"], r2["n_events"], r2["total_value"], r2["max_ts_us"]) == (
        7, 3, 10.0, 20,
    )


def test_emission_schema_matches_output_struct():
    proc = profile_tws.make_profile_processor()
    proc.init(_FakeHandle())
    out = next(
        proc.handleInputRows(
            (1,), iter([pd.DataFrame({"value": [1.0], "ts_us": [1]})]), None
        )
    )
    assert list(out.columns) == [f.name for f in profile_tws.PROFILE_SCHEMA.fields]


def test_wiring_raises_clear_error_without_protobuf(spark):
    """In this container protobuf is absent, so the wiring must refuse
    loudly (not crash the streaming worker mid-query). If protobuf IS
    available, the guard reports runnable and the wiring proceeds —
    skip then (covered by a real run on clusters that have it)."""
    if profile_tws.has_tws_runtime():
        pytest.skip("protobuf present: guard inactive in this environment")
    df = spark.createDataFrame([(1, 1.0, 1)], "user_id long, value double, ts_us long")
    with pytest.raises(NotImplementedError, match="protobuf"):
        profile_tws.transform_with_state_profile(df)
