"""Connected-components cluster resolution over dup pairs."""

from __future__ import annotations

import pytest

from kafka_custom_transforms_spark.operators import clusters


def _comps(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    out = clusters.connected_components(df, **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def test_two_components(spark):
    got = _comps(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_needs_multiple_rounds(spark):
    # path 1-2-3-4-5-6-7: diameter 6, forces several propagation rounds
    got = _comps(spark, [(i, i + 1) for i in range(1, 7)])
    assert got == {i: 1 for i in range(1, 8)}


def test_max_rounds_exceeded_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(1, 7)], "a_id long, b_id long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        clusters.connected_components(df, max_rounds=1)


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "a_id string, b_id string"
    )
    out = clusters.connected_components(df)
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_edge_direction_irrelevant(spark):
    # pairs given with the larger id first still cluster identically
    assert _comps(spark, [(3, 1), (2, 3)]) == {1: 1, 2: 1, 3: 1}


def test_resolve_survivors(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "a_id long, b_id long")
    out = clusters.resolve_survivors(docs, pairs)
    # clusters {1,2,3} -> 1 and {5,6} -> 5; 4 and 7 are untouched singletons
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 4, 5, 7]


def test_checkpoint_modes_agree(spark):
    pairs = [(1, 2), (2, 3), (10, 11)]
    assert _comps(spark, pairs, checkpoint="none") == _comps(
        spark, pairs, checkpoint="local"
    )


def test_star_matches_propagate_on_random_graph(spark):
    import random

    rng = random.Random(7)
    pairs = list({(rng.randint(1, 120), rng.randint(1, 120)) for _ in range(150)})
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _comps(spark, pairs, algorithm="star") == _comps(spark, pairs)


def test_star_converges_fast_on_long_chain(spark):
    # path of 80 nodes: propagation needs ~79 rounds; star converges in
    # O(log^2 n) — must finish well within 12 rounds
    chain = [(i, i + 1) for i in range(1, 80)]
    got = _comps(spark, chain, algorithm="star", max_rounds=12)
    assert got == {i: 1 for i in range(1, 81)}


def test_star_two_components_and_string_ids(spark):
    assert _comps(spark, [(5, 6), (1, 2), (2, 3)], algorithm="star") == {
        1: 1, 2: 1, 3: 1, 5: 5, 6: 5,
    }
    df = spark.createDataFrame([("b", "c"), ("a", "b")], "a_id string, b_id string")
    from kafka_custom_transforms_spark.operators import clusters

    out = clusters.connected_components(df, algorithm="star")
    assert {r["id"]: r["component"] for r in out.collect()} == {
        "a": "a", "b": "a", "c": "a",
    }


def test_bad_algorithm_rejected(spark):
    df = spark.createDataFrame([(1, 2)], "a_id long, b_id long")
    from kafka_custom_transforms_spark.operators import clusters

    with pytest.raises(ValueError, match="algorithm"):
        clusters.connected_components(df, algorithm="bfs")


def test_pagerank_int_hand_computed_and_partition_invariant(spark):
    """3-node chain 1->2->3 (plus 1->3): integer ranks match a hand fold,
    and repartitioning changes nothing (integer sums are order-free)."""
    from kafka_custom_transforms_spark.operators.clusters import pagerank_int

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    # iteration 1 from all-1000: deg(1)=2, deg(2)=1
    #   r1 = 150
    #   r2 = 150 + 850*(1000 div 2) div 1000 = 150 + 425 = 575
    #   r3 = 150 + 850*(500 + 1000) div 1000 = 150 + 1275 = 1425
    one = {
        r["id"]: r["rank_milli"]
        for r in pagerank_int(edges, nodes, iterations=1).collect()
    }
    assert one == {1: 150, 2: 575, 3: 1425}
    # iteration 2: contrib(1)=150 div 2=75, contrib(2)=575
    #   r2 = 150 + 850*75 div 1000 = 150 + 63 = 213
    #   r3 = 150 + 850*(75+575) div 1000 = 150 + 552 = 702
    two = {
        r["id"]: r["rank_milli"]
        for r in pagerank_int(edges, nodes, iterations=2).collect()
    }
    assert two == {1: 150, 2: 213, 3: 702}
    rep = {
        r["id"]: r["rank_milli"]
        for r in pagerank_int(
            edges.repartition(5), nodes.repartition(3), iterations=2
        ).collect()
    }
    assert rep == two
