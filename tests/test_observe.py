"""df.observe() metrics: in-flight data-quality counters collected during
a query (no second scan) — the monitoring hook a production pipeline
attaches to every stage."""

from __future__ import annotations

from pyspark.sql import Observation, functions as F

from kafka_custom_transforms_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_observe_collects_metrics_in_one_pass(spark):
    docs = load_table(spark, SF, "documents")
    obs = Observation("docs_quality")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
        F.min("n_chars").alias("min_chars"),
    )
    # the action that triggers the metrics is the pipeline's own action
    n = observed.filter(F.col("lang") == "en").count()
    m = obs.get
    assert m["n_rows"] == 500  # observed BEFORE the filter
    assert m["n_null_text"] == 0
    assert m["min_chars"] >= 0
    assert n <= 500


def test_observe_composes_with_smt_chain(spark):
    from kafka_custom_transforms_spark import drop_fields, hoist_field, transform_chain

    ev = load_table(spark, SF, "events").select(F.col("props").alias("value"))
    obs = Observation("chain_io")
    chain = transform_chain(
        drop_fields(["k"], json_schema="k int"),
        hoist_field("payload"),
    )
    out = chain(ev.observe(obs, F.count(F.lit(1)).alias("n_in")))
    assert out.count() == 1000
    assert obs.get["n_in"] == 1000


def test_observed_orders_metrics_row_carries_true_metrics(spark):
    """The registry row appends the Observation's delivered metrics as
    literal columns — they must equal an independent recomputation, and
    the per-status group counts must sum to the observed row count (the
    metrics are taken BEFORE the group-by)."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["observed_orders_metrics"](spark, SF).collect()
    o = load_table(spark, SF, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    ref = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.min("cents").alias("m"),
    ).collect()[0]
    assert rows and all(
        r.obs_n_rows == ref.n and r.obs_sum_cents == ref.s and r.obs_min_cents == ref.m
        for r in rows
    )
    assert sum(r.n for r in rows) == ref.n
