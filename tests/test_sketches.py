"""count_min_sketch row: the CMS guarantee holds in-row, and the sketch
aggregate is partitioning-independent (counter addition commutes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_custom_transforms_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _sketch_estimates(spark, df, seed=42):
    sk = df.agg(
        F.expr(
            "count_min_sketch(event_type, cast(0.001 as double),"
            f" cast(0.99 as double), {seed})"
        ).alias("sk")
    ).collect()[0].sk
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(  # noqa: SLF001
        bytes(sk)
    )
    types = [r.event_type for r in df.select("event_type").distinct().collect()]
    return {t: cms.estimateCount(t) for t in types}, cms.totalCount()


def test_cms_row_guarantee_holds_for_every_key(spark, sf_dir):
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["cms_heavy_hitters"](spark, sf_dir).collect()
    assert rows and all(r.cms_ok for r in rows)
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.event_type: r.n for r in rows} == exact


def test_cms_sketch_is_partitioning_independent(spark):
    """The aggregate must produce identical estimates however the input
    is partitioned — CMS counters add commutatively, so a 100 TB
    map-side-combined merge tree is exact w.r.t. the single-partition
    sketch."""
    ev = load_table(spark, SF, "events").select("event_type")
    est1, tot1 = _sketch_estimates(spark, ev.repartition(1))
    est7, tot7 = _sketch_estimates(spark, ev.repartition(7))
    assert est1 == est7
    assert tot1 == tot7
