"""Triangle counting: exactness vs brute force, orientation invariants,
and the plan property that makes it survive skew (wedges generated from
out-edges only)."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from kafka_custom_transforms_spark.operators.graphs import (
    cooccurrence_edges,
    oriented_edges,
    triangle_stats,
    undirected_edges,
)


def _stats(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    return triangle_stats(undirected_edges(df, "a", "b")).collect()[0]


def test_known_graphs(spark):
    # K4 + pendant path: C(4,3) = 4 triangles
    r = _stats(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (6, 8, 4)
    # triangle-free: star
    r = _stats(spark, [(0, i) for i in range(1, 6)])
    assert r.n_triangles == 0 and r.clustering_milli == 0


def test_matches_brute_force(spark):
    rnd = random.Random(4)
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rnd.randrange(20), rnd.randrange(20)) for _ in range(160))
            if a != b
        }
    )
    eset = set(pairs)
    nodes = sorted({x for p in pairs for x in p})
    bf = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    r = _stats(spark, pairs)
    assert r.n_triangles == bf


def test_orientation_bounds_hub_outdegree(spark):
    """100 TB guard: a hub of degree d must keep its edges INCOMING
    (out-degree stays small), so the wedge self-join cannot go quadratic
    in the hub degree."""
    hub = [(0, i) for i in range(1, 101)]  # degree-100 hub
    ring = [(i, i + 1) for i in range(1, 100)]
    df = spark.createDataFrame(hub + ring, "a long, b long")
    o = oriented_edges(undirected_edges(df, "a", "b"))
    outdeg = {r.u: r.cnt for r in o.groupBy("u").agg(F.count("*").alias("cnt")).collect()}
    assert outdeg.get(0, 0) == 0  # every hub edge points INTO the hub
    assert max(outdeg.values()) <= 3


def test_cooccurrence_edges_canonical(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 20), (2, 10), (3, 40)],
        "g long, i long",
    )
    e = sorted((r.a, r.b) for r in cooccurrence_edges(df, "g", "i").collect())
    assert e == [(10, 20), (10, 30), (20, 30)]
