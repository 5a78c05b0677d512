"""Graph analytics over co-occurrence edges: exact triangle counting.

Triangle counting is the classic test of a join engine's ability to do
graph work without a graph engine: it is two self-joins whose
intermediate (the wedge set) explodes quadratically in the degree of hub
nodes unless the edges are ORIENTED first. This implements the standard
degree-ordered compact-forward scheme:

  1. orient every undirected edge {u, v} from the (degree, id)-smaller
     endpoint to the larger — every node's OUT-degree is then at most
     O(sqrt(2m)), whatever the in-degree skew (a hub of degree d keeps
     all d edges incoming);
  2. wedges are pairs of out-edges of one node: the self equi-join on
     the source key generates sum_u outdeg(u)^2 <= O(m^1.5) rows — the
     worst-case-optimal bound — instead of sum_u deg(u)^2, which a hub
     makes quadratic;
  3. a wedge (u -> v, u -> w) closes iff the oriented edge v -> w
     exists: one LEFT SEMI join.

Every triangle is counted exactly once (its minimum-(degree, id) vertex
generates the wedge). The count is orientation-invariant, so the DuckDB
oracle verifies with the simpler id-ordered 3-way join.

No reference counterpart (driver-mandated extension class; the reference
is 3 Kafka SMTs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def undirected_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Canonical distinct undirected edge set: (a, b) with a < b, loops
    dropped. One shuffle (the distinct)."""
    lo = F.least(F.col(a), F.col(b))
    hi = F.greatest(F.col(a), F.col(b))
    return (
        pairs.filter(F.col(a) != F.col(b))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
    )


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Items sharing a group become edges: distinct (group, item), self
    equi-join on the group, canonicalized. Group fan-out bounds the pair
    blow-up (quadratic per group — cap or sample pathological groups
    upstream)."""
    gi = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("i")
    ).distinct()
    pairs = (
        gi.alias("x")
        .join(gi.alias("y"), "g")
        .filter(F.col("x.i") < F.col("y.i"))
        .select(F.col("x.i").alias("a"), F.col("y.i").alias("b"))
    )
    return pairs.distinct()


def cooccurrence_pair_counts(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """(a, b, c): how many groups each canonical item pair shares —
    the weighted co-occurrence graph the kNN sparsifier consumes."""
    gi = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("i")
    ).distinct()
    return (
        gi.alias("x")
        .join(gi.alias("y"), "g")
        .filter(F.col("x.i") < F.col("y.i"))
        .groupBy(F.col("x.i").alias("a"), F.col("y.i").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def knn_graph(counts: DataFrame, k: int = 5) -> DataFrame:
    """Sparsify a weighted pair graph to each node's top-``k`` partners
    by (count DESC, partner ASC) — union semantics (an edge survives if
    EITHER endpoint ranks it), the standard kNN-graph construction for
    similarity/community pipelines. A raw co-occurrence graph with few
    distinct entities degenerates to a clique (every pair shares SOME
    group); the kNN graph keeps only each node's strongest ties, which
    is also what bounds degree at 100 TB. Deterministic: the rank
    tie-breaks on partner id. Returns the canonical (a < b) edge set."""
    directed = counts.select(
        F.col("a").alias("n"), F.col("b").alias("p"), "c"
    ).unionAll(counts.select(F.col("b").alias("n"), F.col("a").alias("p"), "c"))
    w = Window.partitionBy("n").orderBy(F.col("c").desc(), F.col("p").asc())
    kept = (
        directed.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select(
            F.least(F.col("n"), F.col("p")).alias("a"),
            F.greatest(F.col("n"), F.col("p")).alias("b"),
        )
        .distinct()
    )
    return kept


def oriented_edges(edges: DataFrame) -> DataFrame:
    """(u, v): each undirected edge directed from its (degree, id)-smaller
    endpoint. Degrees come from one aggregation over the exploded edge
    list; the orientation join broadcasts the degree table when small,
    else shuffles on the node key."""
    deg = (
        edges.select(F.col("a").alias("n"))
        .unionAll(edges.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    e = edges.join(da, "a").join(db, "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One row: (n_nodes, n_edges, n_wedges, n_triangles,
    clustering_milli). ``edges`` must be the canonical a < b distinct
    set. n_wedges counts unordered neighbor pairs (the closed-triple
    denominator); clustering_milli = 3 * triangles * 1000 // wedges."""
    o = oriented_edges(edges)
    # wedge: two out-edges of u, ordered by the orientation key so each
    # unordered pair appears once
    lt = (F.col("x.dv") < F.col("y.dv")) | (
        (F.col("x.dv") == F.col("y.dv")) & (F.col("x.v") < F.col("y.v"))
    )
    wedges = (
        o.alias("x")
        .join(o.alias("y"), "u")
        .filter(lt)
        .select(
            F.col("x.v").alias("wa"), F.col("y.v").alias("wb")
        )
    )
    closing = o.select(F.col("u").alias("wa"), F.col("v").alias("wb")).unionAll(
        o.select(F.col("v").alias("wa"), F.col("u").alias("wb"))
    )
    tri = wedges.join(closing, ["wa", "wb"], "left_semi")
    deg = (
        edges.select(F.col("a").alias("n"))
        .unionAll(edges.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    counts = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("sum(d * (d - 1)) div 2").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    out = counts.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(n_tri))
    return out.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        # integer div, not float /: a double quotient one ulp under an
        # integer would truncate differently than the oracle's //
        F.expr(
            "case when n_wedges > 0 "
            "then 3 * n_triangles * 1000 div n_wedges else 0L end"
        ).alias("clustering_milli"),
    )
