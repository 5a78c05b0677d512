"""Pre-staged registry candidates for round 21 — implemented and
oracle-tested now, NOT yet registered (<=4 new rows per round, SURVEY
§10.5; same staging pipeline as r14-r20).

Staged rows (surfaces absent from the current 207):
  - grouping_id_provenance — GROUPING SETS with BITMASK provenance:
    grouping_id() + per-column grouping() flags distinguish a real NULL
    group key from a rolled-up one (the provenance the existing
    rollup/cube/grouping-sets rows never exposed). Oracle reconstructs
    every grouping set as a plain GROUP BY UNION ALL with literal masks
    — ground truth, no grouping-sets machinery trusted.
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
  - stream_outer_eviction — state-EVICTION accounting for the
    stream-stream left-outer interval join: rows the watermark evicted
    unmatched emit exactly one NULL row each, so (n_purchases,
    n_matched_pairs, n_evicted) reconciles against the batch left join.
    The existing outer rows pin the joined ROWS; this row pins the state
    lifecycle arithmetic (matched + evicted = universe).
  - similarity_ivf_upsert — IVF index MAINTENANCE: quantizer frozen on
    the indexed 90% of the corpus (seeds + sizing), the arriving 10%
    batch only ASSIGNED to existing cells, queries probe the union.
    Full-pipeline DuckDB oracle (the similarity_topk_ivf construction
    with seeds/params restricted to the indexed subset) — the ANN
    mirror of dedup_minhash_incremental's store-vs-batch shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table


def grouping_id_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three grouping sets in one pass over orders with full provenance:
    gid = grouping_id() (bit per GROUP BY column, status high bit) and the
    per-column grouping() flags. Cents stay integer-exact; one hash
    aggregate per set under the hood (Spark expands grouping sets into a
    single Expand + aggregate — one shuffle total)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    o.createOrReplaceTempView("kcts_gid_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               cast(grouping_id() AS bigint)            AS gid,
               cast(grouping(o_orderstatus) AS bigint)  AS g_status,
               cast(grouping(o_orderpriority) AS bigint) AS g_prio,
               cast(count(*) AS bigint)                 AS n,
               cast(sum(cents) AS bigint)               AS sum_cents
        FROM kcts_gid_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
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


def stream_outer_eviction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-eviction accounting for the stream-stream LEFT OUTER interval
    join (purchases x clicks within 60 s): the watermark evicts each
    unmatched purchase exactly once as a NULL row, so matched + evicted
    reconciles to the purchase universe. Same sentinel/bucket machinery
    as the stream_outer_interval row (left side single-bucket so an
    unmatched purchase emits exactly ONE null row)."""
    import tempfile

    from kafka_custom_transforms_spark.streaming.sinks import write_parquet_stream

    d = tempfile.mkdtemp(prefix="kcts-ssevict-")
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    sentinel = ev.agg(F.max("ts").alias("m")).select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.col("m") + F.expr("INTERVAL 6 HOURS")).alias("ts"),
        F.explode(F.array(F.lit("click"), F.lit("purchase"))).alias("event_type"),
    )
    ev.unionByName(sentinel).coalesce(1).write.parquet(d + "/staged")
    schema = "event_id long, ts timestamp, event_type string"
    grain = 60_000_000  # us; == window width, so a click covers <= 2 buckets
    p = (
        spark.readStream.schema(schema).parquet(d + "/staged")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
        .withColumn("bucket", F.floor(F.unix_micros(F.col("p_ts")) / F.lit(grain)))
    )
    c_us = F.unix_micros(F.col("c_ts"))
    c = (
        spark.readStream.schema(schema).parquet(d + "/staged")
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(c_us / F.lit(grain)),
                    F.floor((c_us + F.lit(grain)) / F.lit(grain)),
                )
            ),
        )
    )
    # No sentinel predicate in the join condition (it would be pushed below
    # the click-side watermark node and stall outer emission — see the
    # stream_outer_interval row); the sentinel pair drops with p_id < 0.
    j = p.join(
        c,
        (p["bucket"] == c["bucket"])
        & F.expr("c_ts between p_ts - interval 60 seconds and p_ts"),
        "leftOuter",
    )
    q = write_parquet_stream(j.drop("bucket"), d + "/sink", d + "/ckpt")
    q.awaitTermination()
    sink = spark.read.parquet(d + "/sink").filter(F.col("p_id") >= 0)
    return sink.agg(
        F.countDistinct("p_id").cast("long").alias("n_purchases"),
        F.sum(F.when(F.col("c_id").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_matched_pairs"),
        F.sum(F.when(F.col("c_id").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_evicted"),
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
    "grouping_id_provenance": grouping_id_provenance,
    "sessionize_late_merge": sessionize_late_merge,
    "stream_outer_eviction": stream_outer_eviction,
    "similarity_ivf_upsert": similarity_ivf_upsert,
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
    # Ground truth: each grouping set as a plain GROUP BY, masks literal.
    "grouping_id_provenance": """
        WITH o AS (
          SELECT o_orderstatus, o_orderpriority,
                 cast(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        )
        SELECT o_orderstatus, o_orderpriority,
               cast(0 AS BIGINT) AS gid, cast(0 AS BIGINT) AS g_status,
               cast(0 AS BIGINT) AS g_prio,
               cast(count(*) AS BIGINT) AS n,
               cast(sum(cents) AS BIGINT) AS sum_cents
        FROM o GROUP BY o_orderstatus, o_orderpriority
        UNION ALL
        SELECT o_orderstatus, NULL,
               cast(1 AS BIGINT), cast(0 AS BIGINT), cast(1 AS BIGINT),
               cast(count(*) AS BIGINT), cast(sum(cents) AS BIGINT)
        FROM o GROUP BY o_orderstatus
        UNION ALL
        SELECT NULL, NULL,
               cast(3 AS BIGINT), cast(1 AS BIGINT), cast(1 AS BIGINT),
               cast(count(*) AS BIGINT), cast(sum(cents) AS BIGINT)
        FROM o
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
    # matched + evicted reconcile against the batch left join.
    "stream_outer_eviction": """
        with p as (select event_id, ts from events where event_type = 'purchase'),
             c as (select event_id, ts from events where event_type = 'click'),
             j as (
               select p.event_id as p_id, c.event_id as c_id
               from p left join c
                 on c.ts between p.ts - interval 60 second and p.ts
             )
        select cast(count(distinct p_id) as bigint) as n_purchases,
               cast(sum(case when c_id is not null then 1 else 0 end) as bigint)
                 as n_matched_pairs,
               cast(sum(case when c_id is null then 1 else 0 end) as bigint)
                 as n_evicted
        from j
    """,
}
STAGED_ORACLES["similarity_ivf_upsert"] = _ivf_upsert_oracle()
