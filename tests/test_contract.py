"""Driver-contract consistency guards: every query has an oracle, every
oracle has a query, bench names resolve — cheap tests that catch the
drift failure mode (renamed query, dangling oracle) before the driver's
gate does."""

from __future__ import annotations

import __spark_entry__ as em
from bench import BENCH_QUERIES


def test_every_query_has_an_oracle():
    qs, os_ = set(em.queries()), set(em.oracle_sql())
    assert qs - os_ == set(), f"queries without oracle: {sorted(qs - os_)}"


def test_every_oracle_has_a_query():
    qs, os_ = set(em.queries()), set(em.oracle_sql())
    assert os_ - qs == set(), f"dangling oracles: {sorted(os_ - qs)}"


def test_bench_queries_resolve():
    qs = set(em.queries())
    missing = [n for n in BENCH_QUERIES if n not in qs]
    assert missing == []


def test_query_names_are_stable_identifiers():
    import re

    for name in em.queries():
        assert re.fullmatch(r"[a-z0-9_]+", name), name


def test_pyproject_version_matches_package():
    """Packaging metadata must not drift from __init__.__version__."""
    import os

    try:
        import tomllib  # stdlib since 3.11
    except ModuleNotFoundError:  # requires-python floor is 3.10
        import pytest

        pytest.skip("tomllib unavailable (Python < 3.11)")

    import kafka_custom_transforms_spark as pkg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["version"] == pkg.__version__
    assert meta["project"]["name"] == "kafka-custom-transforms-spark"
