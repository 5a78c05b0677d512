"""Pseudonymization tests: joinability, salt rotation, original removal."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_custom_transforms_spark.functions.privacy import pseudonymize


def test_tokens_preserve_joinability(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "uid long, pa string")
    b = spark.createDataFrame([(1, "m"), (3, "n")], "uid long, pb string")
    ta = pseudonymize(a, ["uid"], salt="s1")
    tb = pseudonymize(b, ["uid"], salt="s1")
    joined = ta.join(tb, "uid_pseudo").select("pa", "pb").collect()
    assert [(r.pa, r.pb) for r in joined] == [("x", "m")]  # uid=1 still links
    assert "uid" not in ta.columns  # raw id gone by default


def test_salt_rotation_unlinks(spark):
    a = spark.createDataFrame([(1,)], "uid long")
    t1 = pseudonymize(a, ["uid"], salt="s1").collect()[0].uid_pseudo
    t2 = pseudonymize(a, ["uid"], salt="s2").collect()[0].uid_pseudo
    assert t1 != t2
    assert len(t1) == len(t2) == 15


def test_keep_original_and_zero_shuffle(spark):
    from kafka_custom_transforms_spark.plans.explain import plan_str

    a = spark.createDataFrame([(7, "p")], "uid long, payload string")
    t = pseudonymize(a, ["uid"], salt="s", keep_original=True)
    assert set(t.columns) == {"uid", "payload", "uid_pseudo"}
    ev = spark.range(10).withColumnRenamed("id", "uid")
    assert "Exchange" not in plan_str(pseudonymize(ev, ["uid"], salt="s"), "simple")
