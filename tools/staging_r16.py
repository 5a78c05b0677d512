"""Pre-staged registry candidates for round 16 — implemented and
oracle-tested now, NOT yet registered (the correctness-window rotation
budget is <=4 new rows per round, SURVEY §10.5; round 15 lifted
tools/staging_r15.py, round 16 lifts this module).

Each entry mirrors the registry contract exactly: a ``(spark, sf_dir) ->
DataFrame`` callable plus a DuckDB oracle SQL string with matching column
names. ``tests/test_staging_r16.py`` runs the driver-gate
normalize-and-compare at sf0.001; verify once at sf0.01 before lifting.

QUEUE REORDER (r15, closing the r14 verdict's item 7): with 20 rounds
total, lifts happen r16-r20 from modules r16-r20 — tools/staging_r21.py
never lifts. sessionize_late_merge and similarity_ivf_upsert moved here
from that module (they oracle-check the r14 sessionize_late and
frozen-quantizer operators, which otherwise would never earn a registry
row); bitmap_retention and ordinal_assign_docs moved back to r21 as
implemented spares — their operators keep registry coverage elsewhere
(bitmap merges via the registered bitmap_gsets_distinct and
bitmap_distinct_users rows; functions/ordinal.global_ordinal via the
r19-staged rfm_segments row, plus both operators' unit suites).

Staged rows:
  - moments_lineitem — exact distributed skewness and excess kurtosis
    per return flag from integer power sums (the OLS playbook one moment
    deeper): S1..S4 over cast-to-bigint l_quantity are order-independent
    exact sums; the central moments and both shape statistics come from
    ONE closed-form double expression mirrored verbatim in the oracle.
    pow() is avoided (libm variance across engines): skew divides by
    sqrt(m2^3) — IEEE sqrt is correctly rounded everywhere.  The oracle
    does NOT call DuckDB's skewness()/kurtosis() (sample-convention,
    n/(n-1)-corrected); the independent-implementation test converts and
    compares against those builtins separately.
  - event_transitions — first-order Markov transition counts over each
    user's time-ordered event stream: lead() per user, then a bigram
    groupBy.  One shuffle keyed on user_id (window) + one on the bigram
    (aggregate with map-side partials); ties on ts are broken by
    event_id so both engines see the same sequence.
  - sessionize_late_merge — LATE-DATA semantics of sessionization: a
    second micro-batch delivers events with EARLIER timestamps than the
    first batch's maximum (late by up to the full corpus span, admitted
    by the watermark delay), and they must MERGE into held per-user
    sessions — the final output is bit-identical to the batch gap-split
    over all events. Exercises streaming.dedup.sessionize_late (r14):
    the immediate-emission sessionizer provably CANNOT satisfy this
    (append mode cannot retract; staging measured 774 fragmented
    sessions vs the oracle's 946), so the late-tolerant variant holds
    sessions in state until the watermark finalizes them.
  - similarity_ivf_upsert — IVF index MAINTENANCE: quantizer frozen on
    the indexed 90% of the corpus (seeds + sizing), the arriving 10%
    batch only ASSIGNED to existing cells, queries probe the union.
    Full-pipeline DuckDB oracle (the similarity_topk_ivf construction
    with seeds/params restricted to the indexed subset) — the ANN
    mirror of dedup_minhash_incremental's store-vs-batch shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table


def moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis of l_quantity per return flag from
    exact bigint power sums (q <= 50 so q^4 <= 6.25e6 per row; the sums
    stay int64 far past sf100).  One partial/final aggregate pair,
    constant state per group; the double arithmetic happens once per
    GROUP, not per row, and mirrors the oracle token for token."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    )
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
        F.sum(F.col("q") * F.col("q") * F.col("q")).alias("s3"),
        F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q")).alias("s4"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    m2 = r2 - mean * mean
    m3 = r3 - F.lit(3.0) * mean * r2 + F.lit(2.0) * mean * mean * mean
    m4 = (
        r4
        - F.lit(4.0) * mean * r3
        + F.lit(6.0) * mean * mean * r2
        - F.lit(3.0) * mean * mean * mean * mean
    )
    return s.select(
        "l_returnflag",
        "n",
        (m3 / F.sqrt(m2 * m2 * m2)).alias("skew_qty"),
        (m4 / (m2 * m2) - F.lit(3.0)).alias("kurt_qty"),
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type bigram counts over each user's time-ordered stream.
    The lead() window shuffles once on user_id with a partition-local
    (ts, event_id) sort; the bigram aggregate benefits from map-side
    partials because transition cardinality is event_types^2, tiny
    against the row count at any scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )


def sessionize_late_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.dedup.sessionize_late under LATE data: batch 1 carries
    event_id % 5 != 0, batch 2 the % 5 == 0 remainder (late — older than
    batch 1's max ts), batch 3 the far-future sentinel whose watermark
    advance fires every event-time timeout. The watermark delay exceeds
    the corpus span, so every late row is admitted and merges into HELD
    session state (bridging splits, extending bounds); the emitted
    sessions equal the batch gap-split over ALL events."""
    import glob as _glob
    import os as _os
    import tempfile
    import time as _time

    from kafka_custom_transforms_spark.streaming.dedup import sessionize_late
    from kafka_custom_transforms_spark.streaming.sinks import write_parquet_stream

    d = tempfile.mkdtemp(prefix="kcts-sess-late-")
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span_s = int((hi - lo).total_seconds()) + 3600
    schema = "event_id long, ts timestamp, user_id long"

    def _stage(df, mtime):
        before = set(_glob.glob(d + "/staged/*.parquet"))
        df.coalesce(1).write.mode("append").parquet(d + "/staged")
        # FileStreamSource orders files by modification time — force the
        # intended batch order regardless of fs timestamp granularity.
        for f in set(_glob.glob(d + "/staged/*.parquet")) - before:
            _os.utime(f, (mtime, mtime))

    now = _time.time()
    _stage(ev.filter(F.col("event_id") % 5 != 0), now + 60)
    _stage(ev.filter(F.col("event_id") % 5 == 0), now + 120)  # the LATE batch
    sentinel = spark.createDataFrame([(-1, hi, -1)], schema).withColumn(
        "ts", F.col("ts") + F.expr(f"INTERVAL {2 * span_s} SECONDS")
    )
    _stage(sentinel, now + 180)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/staged")
    )
    sessions = sessionize_late(
        stream, key_col="user_id", ts_col="ts", gap="30 minutes",
        watermark_delay=f"{span_s} seconds",
    )
    q = write_parquet_stream(sessions, d + "/sink", d + "/ckpt")
    q.awaitTermination()
    out = spark.read.parquet(d + "/sink").filter(F.col("user_id") >= 0)
    return out.select(
        "user_id",
        "n_events",
        F.unix_micros(F.col("first_ts")).alias("first_epoch_us"),
        F.unix_micros(F.col("last_ts")).alias("last_epoch_us"),
    )



def similarity_ivf_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-quantizer IVF upsert: the index derives from the 90%
    'indexed' subset (vec_id % 10 != 3); the arriving 10% batch is only
    assigned; queries (vec_id % 50 == 0, over the union) probe as usual.
    Fully oracle-checked — the DuckDB replay recomputes seeds and sizing
    from the indexed subset and the assignment over the union."""
    from kafka_custom_transforms_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    indexed = emb.filter(F.col("vec_id") % 10 != 3)
    arriving = emb.filter(F.col("vec_id") % 10 == 3)
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    out = similarity.ivf_upsert_topk_neighbors(
        indexed, arriving, queries_df, k=5, n_probe=8, dim=64
    )
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    )


STAGED = {
    "sessionize_late_merge": sessionize_late_merge,
    "similarity_ivf_upsert": similarity_ivf_upsert,
    "moments_lineitem": moments_lineitem,
    "event_transitions": event_transitions,
}

def _ivf_upsert_oracle() -> str:
    """The similarity_topk_ivf full-pipeline oracle with quantizer
    derivation (params/seeds) restricted to the INDEXED subset while
    coarse/fine assignment covers the union — the frozen-quantizer
    contract, replayed bit-exactly."""
    import __spark_entry__ as entry_mod

    cos = entry_mod._COSINE_EXPR
    return """
with e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
eo as (select * from e where vec_id % 10 != 3),
params as (select greatest(16, cast(round(sqrt(count(*))) as int)) as nc from eo),
params2 as (
  select nc,
         case when nc < 256 then 1
              else greatest(8, cast(round(sqrt(nc)) as int)) end as ng
  from params
),
seeds as (
  select cid, cv from (
    select vec_id as cid, v as cv,
           row_number() over (order by md5(cast(vec_id as varchar)), vec_id) as rn
    from eo)
  where rn <= (select nc from params)
),
gseeds as (
  select gid, gv from (
    select cid as gid, cv as gv,
           row_number() over (order by md5(cast(cid as varchar)), cid) as rn
    from seeds)
  where rn <= (select ng from params2)
),
reg as (
  select gid, cid, cv from (
    select g.gid, s.cid, s.cv,
           row_number() over (partition by s.cid
                              order by {cos_sg} desc, g.gid) as rn
    from seeds s, gseeds g)
  where rn <= (select least(greatest(4, (3 * ng) // 4), 16, ng) from params2)
),
gactive as (select gid, gv from gseeds where gid in (select gid from reg)),
vcoarse as (
  select id, gid from (
    select e.vec_id as id, g.gid,
           row_number() over (partition by e.vec_id
                              order by {cos_eg} desc, g.gid) as rn
    from e, gactive g)
  where rn = 1
),
assign as (
  select id, cid from (
    select v.id, r.cid,
           row_number() over (partition by v.id
                              order by {cos_er} desc, r.cid) as rn
    from vcoarse v
    join reg r using (gid)
    join e on e.vec_id = v.id)
  where rn = 1
),
q as (select vec_id as query_id, v as qv from e where vec_id % 50 = 0),
probes as (
  select query_id, cid from (
    select q.query_id, s.cid,
           row_number() over (partition by q.query_id
                              order by {cos_qs} desc, s.cid) as rn
    from q, seeds s)
  where rn <= (select least(8, nc // 2) from params)
),
scored as (
  select p.query_id, a.id as neighbor_id, {cos_qb} as c
  from probes p
  join assign a using (cid)
  join e b on b.vec_id = a.id
  join q on q.query_id = p.query_id
  where a.id != p.query_id
)
select query_id, neighbor_id,
       cast(row_number() over (partition by query_id
            order by c desc, neighbor_id) as bigint) as rank
from scored
qualify rank <= 5
""".format(
        cos_sg=cos.format(a="s.cv", b="g.gv"),
        cos_eg=cos.format(a="e.v", b="g.gv"),
        cos_er=cos.format(a="e.v", b="r.cv"),
        cos_qs=cos.format(a="q.qv", b="s.cv"),
        cos_qb=cos.format(a="q.qv", b="b.v"),
    )



STAGED_ORACLES = {
    # Same closed form token for token (see module docstring: the
    # CONVENTION-divergent builtins are pinned separately in
    # tests/test_staging_r16.py, converted).
    "moments_lineitem": """
        WITH s AS (
          SELECT l_returnflag,
                 cast(count(*) AS BIGINT) AS n,
                 sum(cast(l_quantity AS BIGINT)) AS s1,
                 sum(cast(l_quantity AS BIGINT) * cast(l_quantity AS BIGINT)) AS s2,
                 sum(cast(l_quantity AS BIGINT) * cast(l_quantity AS BIGINT)
                     * cast(l_quantity AS BIGINT)) AS s3,
                 sum(cast(l_quantity AS BIGINT) * cast(l_quantity AS BIGINT)
                     * cast(l_quantity AS BIGINT) * cast(l_quantity AS BIGINT)) AS s4
          FROM lineitem GROUP BY l_returnflag
        ),
        d AS (
          SELECT l_returnflag, n,
                 cast(s1 AS DOUBLE) / cast(n AS DOUBLE) AS mean,
                 cast(s2 AS DOUBLE) / cast(n AS DOUBLE) AS r2,
                 cast(s3 AS DOUBLE) / cast(n AS DOUBLE) AS r3,
                 cast(s4 AS DOUBLE) / cast(n AS DOUBLE) AS r4
          FROM s
        ),
        m AS (
          SELECT l_returnflag, n,
                 r2 - mean * mean AS m2,
                 r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean AS m3,
                 r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
                    - 3.0 * mean * mean * mean * mean AS m4
          FROM d
        )
        SELECT l_returnflag, n,
               m3 / sqrt(m2 * m2 * m2) AS skew_qty,
               m4 / (m2 * m2) - 3.0 AS kurt_qty
        FROM m
    """,
    "event_transitions": """
        WITH seq AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM events
        )
        SELECT from_type, to_type, cast(count(*) AS BIGINT) AS n_trans
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    """,
    # The stream's late batch must merge, so the final state equals the
    # batch gap-split over ALL events — the same oracle as events_sessionize.
    "sessionize_late_merge": """
        with g as (
          select user_id, ts,
                 case when epoch_us(ts) - coalesce(
                       lag(epoch_us(ts)) over (partition by user_id order by ts), 0)
                       > 1800000000
                      then 1 else 0 end as new_session
          from events
        ),
        s as (
          select user_id, ts,
                 sum(new_session) over (partition by user_id order by ts
                                        rows between unbounded preceding and current row) as sid
          from g
        )
        select user_id,
               cast(count(*) as bigint) as n_events,
               cast(epoch_us(min(ts)) as bigint) as first_epoch_us,
               cast(epoch_us(max(ts)) as bigint) as last_epoch_us
        from s
        group by user_id, sid
    """,
}

STAGED_ORACLES["similarity_ivf_upsert"] = _ivf_upsert_oracle()
