"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count, column names, and exact values (order-insensitive).

Uses sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

import __spark_entry__ as entry_mod

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity_common import TABLES, normalize as _normalize  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


QUERIES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    oracles = entry_mod.oracle_sql()
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR).toPandas()
    if name not in oracles:
        assert len(sdf) >= 0  # rows-only check (driver's weak mode)
        return
    odf = ddb.execute(oracles[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    a, b = _normalize(sdf), _normalize(odf)
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch; first differing rows:\n"
            f"spark:\n{a[diff_mask].head(5)}\noracle:\n{b[diff_mask].head(5)}"
        )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"event_type", "n", "n_keys"}
