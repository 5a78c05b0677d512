"""Data-contract validation: every rule kind flags seeded violations, and
the inline rules share one scan."""

from __future__ import annotations

from kafka_custom_transforms_spark.operators import quality as Q
from kafka_custom_transforms_spark.plans.explain import plan_str


def _dirty(spark):
    rows = [
        (1, 10.0, "1-URGENT", 100),
        (1, -5.0, "9-BAD", 100),      # dup key, negative price, bad priority
        (2, None, "2-HIGH", 999),     # null price, orphan custkey
        (None, 20.0, None, 100),      # null key, null priority
    ]
    return spark.createDataFrame(
        rows, "k long, price double, prio string, ck long"
    )


def _ref(spark):
    return spark.createDataFrame([(100,), (101,)], "c long")


def test_each_rule_kind_counts_seeded_violations(spark):
    df, ref = _dirty(spark), _ref(spark)
    out = {
        r["rule"]: r["n_violations"]
        for r in Q.validate_rules(
            df,
            [
                Q.not_null("k_not_null", "k"),
                Q.in_range("price_ok", "price", lo=0.0),
                Q.matches("prio_fmt", "prio", "^[1-5]-[A-Z ]+$"),
                Q.unique("k_unique", "k"),
                Q.foreign_key("ck_fk", "ck", ref, "c"),
            ],
        ).collect()
    }
    assert out == {
        "k_not_null": 1,
        "price_ok": 2,  # negative + null
        "prio_fmt": 2,  # 9-BAD + null
        "k_unique": 1,  # k=1 twice -> 1 extra
        "ck_fk": 1,  # ck=999
    }


def test_inline_rules_share_one_scan(spark, sf_dir):
    from kafka_custom_transforms_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = Q.validate_rules(
        orders,
        [
            Q.not_null("a", "o_orderkey"),
            Q.in_range("b", "o_totalprice", lo=0.0),
            Q.matches("c", "o_orderpriority", "^[1-5]"),
        ],
    )
    plan = plan_str(out, "simple")
    assert plan.count("FileScan") == 1, plan


def test_invalid_contracts_raise_clear_errors(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="empty rules"):
        Q.validate_rules(df, [])
    with pytest.raises(ValueError, match="at least one key"):
        Q.unique("r")


def test_empty_input_reports_zero_for_every_rule_kind(spark):
    """Advisor r3: SUM over zero rows is NULL, so inline rules on an empty
    table used to report n_violations = NULL while unique/FK reported 0 —
    a `== 0` promotion gate would fail closed. All kinds must report 0."""
    df = spark.createDataFrame([], "id long, name string, v double")
    ref = spark.createDataFrame([(1,)], "id long")
    out = Q.validate_rules(
        df,
        [
            Q.not_null("nn", "name"),
            Q.in_range("rng", "v", lo=0.0, hi=1.0),
            Q.matches("re", "name", "^x"),
            Q.unique("uq", "id"),
            Q.foreign_key("fk", "id", ref, "id"),
        ],
    )
    rows = {r.rule: r.n_violations for r in out.collect()}
    assert rows == {"nn": 0, "rng": 0, "re": 0, "uq": 0, "fk": 0}


def test_foreign_key_broadcast_is_conditional(spark):
    """Advisor r3: a large reference must not be force-broadcast. With
    broadcast_ref=False no broadcast hint is attached (the logical plan has
    no ResolvedHint); with True it is; counts agree either way."""
    df = spark.createDataFrame([(1,), (2,), (9,)], "id long")
    ref = spark.createDataFrame([(1,), (2,)], "id long")
    forced = Q.validate_rules(df, [Q.foreign_key("fk", "id", ref, "id", broadcast_ref=True)])
    free = Q.validate_rules(df, [Q.foreign_key("fk", "id", ref, "id", broadcast_ref=False)])
    forced_logical = forced._jdf.queryExecution().analyzed().toString()
    free_logical = free._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in forced_logical
    assert "ResolvedHint" not in free_logical
    assert forced.collect()[0].n_violations == 1
    assert free.collect()[0].n_violations == 1
