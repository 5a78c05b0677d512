"""Pre-staged registry candidates for round 12 — implemented and
oracle-tested now, NOT yet registered in ``__spark_entry__.py`` (the
correctness-window rotation budget is <=4 new rows per round, SURVEY
§10.5; round 11's budget is spent). Round 12's first registry commit can
lift these verbatim.

Each entry mirrors the registry contract exactly: a ``(spark, sf_dir) ->
DataFrame`` callable plus a DuckDB oracle SQL string with matching column
names.  ``tests/test_staging_r12.py`` runs the same normalize-and-compare
as ``tests/test_oracle_parity.py`` at sf0.001; all four were additionally
verified at the driver's gate scale, sf0.01, late r11 (4/4 OK).

Staged rows (all surfaces absent from the current 195):
  - recursive_cte_doc_depth  — Spark 4 ``WITH RECURSIVE`` (new SQL surface,
    like the r9 pipe-syntax row): level-order walk of the implicit binary
    doc tree; DuckDB runs the identical statement.
  - approx_topk_event_types  — Spark 4.1 ``approx_top_k`` sketch; with
    maxItemsTracked >= distinct keys the sketch is EXACT, so the oracle is
    plain GROUP BY / ORDER BY / LIMIT (boundary verified tie-free on this
    data).
  - order_stats_lineitem     — exact order statistics: ``mode()`` +
    ``percentile_disc WITHIN GROUP``.  mode() is tie-free by construction
    (l_linenumber=1 exists in every order, strictly most frequent).  The
    oracle re-derives percentile_disc's documented convention (smallest
    value with cume_dist >= q) with a window, NOT DuckDB quantile_disc,
    whose floor(q*(n-1)) indexing diverges at e.g. n=10, q=0.75.
  - phrase_index_docs        — inverted-index phrase search: posexplode to
    (doc, pos, word) postings, two term filters, adjacency equi-join on
    (doc_id, pos+1).  The IR shape the corpus rows don't cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table


def recursive_cte_doc_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth histogram of the implicit binary doc tree (i -> 2i+1, 2i+2;
    the same tree as pagerank_doc_tree) via Spark 4 recursive CTE.
    Per-level: node count and total characters.  The recursion is a
    bounded iterative equi-join (log2(N) rounds); each round shuffles
    only the frontier, not the full table."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("kcts_docs_rec")
    return spark.sql(_RECURSIVE_SQL.format(docs="kcts_docs_rec"))


# The loop join matches children by their COMPUTED PARENT id, not by an
# OR over the two child ids: `child = 2p+1 OR child = 2p+2` plans as a
# nested-loop join per iteration (O(frontier x table)), while
# `parent(child) = p` is a plain hash-joinable equi-join.  floor() is
# explicit because bare CAST diverges between engines: Spark truncates
# double->bigint while DuckDB rounds half-to-even (child 4: parent 1 vs
# 2), so `cast((id-1)/2 as bigint)` is NOT portable; cast(floor(...)) is
# (ids are far below 2^53, the double division is exact).
_RECURSIVE_SQL = """
WITH RECURSIVE walk (doc_id, depth) AS (
  SELECT doc_id, 0 FROM {docs} WHERE doc_id = 0
  UNION ALL
  SELECT d.doc_id, w.depth + 1
  FROM walk w
  JOIN {docs} d
    ON d.doc_id >= 1 AND CAST(floor((d.doc_id - 1) / 2) AS BIGINT) = w.doc_id
)
SELECT w.depth AS depth,
       cast(count(*) AS bigint)       AS n_docs,
       cast(sum(d.n_chars) AS bigint) AS sum_chars
FROM walk w JOIN {docs} d ON d.doc_id = w.doc_id
GROUP BY w.depth
"""


def approx_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark 4.1's approx_top_k sketch.  maxItemsTracked
    (10000) far exceeds the key cardinality, so every tracked count is
    exact and the top-k boundary is tie-free on this data — the oracle is
    the exact GROUP BY top-k.  Scale shape: one partial/final aggregate
    pair, sketch size O(maxItemsTracked) per partition regardless of row
    count."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(F.expr("approx_top_k(event_type, 3, 10000)").alias("tk"))
    hit = sk.select(F.explode("tk").alias("h"))
    return hit.select(
        F.col("h.item").alias("event_type"),
        F.col("h.count").cast("long").alias("cnt"),
    )


def order_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics per return flag: mode(l_linenumber) (tie-free:
    linenumber 1 exists in every order, strictly most frequent) and the
    discrete quantiles of l_quantity.  percentile_disc selects actual data
    values — no interpolation arithmetic — so cross-engine equality is
    exact; one shuffle on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("kcts_li_stats")
    return spark.sql(
        """
        SELECT l_returnflag,
               cast(mode(l_linenumber) AS bigint) AS mode_linenumber,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q25_qty,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY l_quantity) AS q50_qty,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS q75_qty
        FROM kcts_li_stats
        GROUP BY l_returnflag
        """
    )


PHRASE = ("table", "scan")


def phrase_index_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search over an inverted index: posexplode the corpus into
    (doc_id, pos, word) postings, filter the two posting lists, and join
    on adjacency (same doc, pos+1).  Both sides co-partition on doc_id —
    one shuffle each, then a local sort-merge; per-doc hit count and first
    position.  At 100 TB the postings frame is the materialization point
    (bucket by doc_id); stopword terms skew the term-filtered sides, not
    the join key."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    a = words.filter(F.col("w") == PHRASE[0]).select("doc_id", F.col("pos").alias("p0"))
    b = words.filter(F.col("w") == PHRASE[1]).select("doc_id", F.col("pos").alias("p1"))
    hits = a.join(b, (a.doc_id == b.doc_id) & (b.p1 == a.p0 + 1)).select(a.doc_id, "p0")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("p0").cast("long").alias("first_pos"),
    )


STAGED = {
    "recursive_cte_doc_depth": recursive_cte_doc_depth,
    "approx_topk_event_types": approx_topk_event_types,
    "order_stats_lineitem": order_stats_lineitem,
    "phrase_index_docs": phrase_index_docs,
}

STAGED_ORACLES = {
    "recursive_cte_doc_depth": _RECURSIVE_SQL.format(docs="documents"),
    "approx_topk_event_types": """
        SELECT event_type, cast(count(*) AS bigint) AS cnt
        FROM events GROUP BY event_type ORDER BY cnt DESC LIMIT 3
    """,
    # percentile_disc's convention (smallest value with cume_dist >= q),
    # derived explicitly — DuckDB's quantile_disc indexes floor(q*(n-1))
    # and diverges (e.g. n=10, q=0.75: rank 8 vs rank 7).
    "order_stats_lineitem": """
        WITH ranked AS (
          SELECT l_returnflag, l_quantity, l_linenumber,
                 cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
          FROM lineitem
        ),
        q AS (
          SELECT l_returnflag,
                 min(CASE WHEN cd >= 0.25 THEN l_quantity END) AS q25_qty,
                 min(CASE WHEN cd >= 0.50 THEN l_quantity END) AS q50_qty,
                 min(CASE WHEN cd >= 0.75 THEN l_quantity END) AS q75_qty
          FROM ranked GROUP BY l_returnflag
        ),
        m AS (
          SELECT l_returnflag, cast(mode(l_linenumber) AS bigint) AS mode_linenumber
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT q.l_returnflag, m.mode_linenumber, q.q25_qty, q.q50_qty, q.q75_qty
        FROM q JOIN m USING (l_returnflag)
    """,
    "phrase_index_docs": """
        WITH words AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS w,
                 unnest(range(0, len(string_split(text, ' ')))) AS pos
          FROM documents
        )
        SELECT a.doc_id,
               cast(count(*) AS bigint) AS n_hits,
               cast(min(a.pos) AS bigint) AS first_pos
        FROM words a
        JOIN words b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        WHERE a.w = 'table' AND b.w = 'scan'
        GROUP BY a.doc_id
    """,
}
