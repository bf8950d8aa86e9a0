"""Expectations framework: WARN keeps+counts, DROP filters+counts,
FAIL aborts — exercised with the reference's bad-data injection classes
(FIXTURES.md §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.operators.expectations import (
    ExpectationFailed,
    check_fail_metrics,
    enforce,
    expect,
    expect_or_drop,
    expect_or_fail,
)


@pytest.fixture(scope="module")
def orders_fixture(spark):
    """Olist-shaped orders with ~2% injected violations (FIXTURES.md §3)."""
    rows = [
        # (order_id, status, price)
        ("a" * 32, "delivered", 100.0),
        ("b" * 32, "shipped", 50.0),
        ("c" * 32, "created", 10.0),
        (None, "delivered", 20.0),             # null id
        ("SHORT", "delivered", 30.0),          # short id
        ("d" * 32, "INVALID_STATUS_XYZ", 40.0),  # invalid status
        ("e" * 32, "delivered", -5.0),         # negative price
    ]
    return spark.createDataFrame(rows, "order_id string, order_status string, price double")


VALID_STATUSES = (
    "created approved invoiced processing shipped delivered unavailable canceled".split()
)


def test_drop_filters_and_counts(spark, orders_fixture):
    exps = [
        expect_or_drop("valid_id", F.length(F.col("order_id")) == 32),
        expect_or_drop("valid_status", F.col("order_status").isin(VALID_STATUSES)),
    ]
    result = enforce(orders_fixture, exps)
    kept = result.df.collect()
    assert {r.order_id for r in kept} == {"a" * 32, "b" * 32, "c" * 32, "e" * 32}
    metrics = result.metrics()
    assert metrics["valid_id"] == 2  # null + short
    assert metrics["valid_status"] == 1


def test_warn_keeps_rows_and_counts(spark, orders_fixture):
    exps = [expect("non_negative_price", F.col("price") >= 0)]
    result = enforce(orders_fixture, exps)
    assert result.df.count() == 7  # nothing dropped
    assert result.metrics()["non_negative_price"] == 1


def test_fail_aborts_on_violation(spark, orders_fixture):
    exps = [expect_or_fail("no_negative", F.col("price") >= 0)]
    with pytest.raises(ExpectationFailed):
        enforce(orders_fixture, exps)


def test_fail_passes_when_clean(spark, orders_fixture):
    clean = orders_fixture.filter(F.col("price") >= 0)
    exps = [expect_or_fail("no_negative", F.col("price") >= 0)]
    result = enforce(clean, exps)
    assert result.df.count() == 6


def test_fail_deferred_strategy(spark, orders_fixture):
    exps = [expect_or_fail("no_negative", F.col("price") >= 0)]
    result = enforce(orders_fixture, exps, fail_strategy="defer")
    result.df.count()  # the caller's action
    with pytest.raises(ExpectationFailed):
        check_fail_metrics(result, exps)


def test_null_predicate_counts_as_violation(spark):
    df = spark.createDataFrame([(None,), (5,)], "score int")
    exps = [expect_or_drop("score_range", F.col("score").between(1, 5))]
    result = enforce(df, exps)
    assert result.df.count() == 1
    assert result.metrics()["score_range"] == 1


def test_string_predicate_form(spark, orders_fixture):
    result = enforce(orders_fixture, [expect_or_drop("pos", "price >= 0")])
    assert result.df.count() == 6


def test_aggregate_expectations_single_job(spark):
    from pyspark.sql import functions as F

    from olist_lakehouse_2_0_spark.operators.expectations import (
        ExpectationFailed,
        enforce_aggregate,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)], "id long, v double"
    )
    ok = enforce_aggregate(
        df,
        {
            "min_rows": F.count(F.lit(1)) >= 3,
            "null_share_bounded": (
                F.sum(F.col("v").isNull().cast("int")) / F.count(F.lit(1))
            )
            <= 0.5,
        },
    )
    assert ok == {"min_rows": True, "null_share_bounded": True}

    with pytest.raises(ExpectationFailed) as e:
        enforce_aggregate(
            df,
            {
                "min_rows": F.count(F.lit(1)) >= 100,
                "positive_total": F.sum("v") > 0,
            },
        )
    assert "min_rows" in str(e.value) and "positive_total" not in str(e.value)


def test_aggregate_expectation_null_result_fails(spark):
    """An aggregate check that evaluates to NULL (e.g. sum over an
    empty relation) must fail closed, not pass silently."""
    from pyspark.sql import functions as F

    from olist_lakehouse_2_0_spark.operators.expectations import (
        ExpectationFailed,
        enforce_aggregate,
    )

    empty = spark.createDataFrame([], "id long, v double")
    with pytest.raises(ExpectationFailed):
        enforce_aggregate(empty, {"positive_total": F.sum("v") > 0})


def test_quarantine_captures_dropped_rows_with_labels(spark):
    from pyspark.sql import functions as F

    from olist_lakehouse_2_0_spark.operators.expectations import (
        enforce,
        expect_or_drop,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "A"), (3, 7.0, "X"), (4, -1.0, "X")],
        "id long, amount double, flag string",
    )
    exps = [
        expect_or_drop("amount_positive", F.col("amount") > 0),
        expect_or_drop("flag_domain", F.col("flag").isin("A", "B")),
    ]
    res = enforce(df, exps, quarantine=True)
    assert [r["id"] for r in res.df.orderBy("id").collect()] == [1]
    q = {r["id"]: sorted(r["_violated"]) for r in res.quarantined.collect()}
    assert q == {
        2: ["amount_positive"],
        3: ["flag_domain"],
        4: ["amount_positive", "flag_domain"],
    }


def test_gate_report_decision_table_and_quoted_names(spark):
    """gate_report must emit one row per rule with the blocking verdict,
    and rule names containing quotes must stay data (the unpivot is
    built from Column literals, not interpolated SQL)."""
    from olist_lakehouse_2_0_spark.operators.expectations import (
        expect,
        expect_or_fail,
        gate_report,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 10).select(F.col("id").alias("v"))
    rows = {
        r["rule"]: (r["action"], r["violations"], r["gate_blocks"])
        for r in gate_report(
            df,
            [
                expect_or_fail("v's cap", F.col("v") < 5),   # 5 violations
                expect_or_fail("clean", F.col("v") >= 0),    # 0 violations
                expect("warn'd rule", F.col("v") != 3),      # 1 violation
            ],
        ).collect()
    }
    assert rows["v's cap"] == ("fail", 5, True)
    assert rows["clean"] == ("fail", 0, False)
    assert rows["warn'd rule"] == ("warn", 1, False)


def test_gate_report_empty_expectations(spark):
    """gate_report on an empty rule list must return an empty decision
    table with the standard schema, mirroring enforce()'s no-op
    (ADVICE r3: df.agg() with zero exprs raised)."""
    from pyspark.sql import functions as F

    from olist_lakehouse_2_0_spark.operators.expectations import gate_report

    df = spark.range(0, 3).select(F.col("id").alias("v"))
    out = gate_report(df, [])
    assert out.columns == ["rule", "action", "violations", "gate_blocks"]
    assert out.count() == 0


def test_aggregate_gate_report_decision_table(spark):
    """The aggregate gate's decision relation: one row per table-level
    check, failures block, NULL-valued checks fail closed."""
    from pyspark.sql import functions as F

    from olist_lakehouse_2_0_spark.operators.expectations import (
        aggregate_gate_report,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id long, v double"
    )
    rep = {
        r.rule: (r.passed, r.gate_blocks)
        for r in aggregate_gate_report(
            df,
            {
                "min_rows": F.count(F.lit(1)) >= 3,
                "too_many_rows": F.count(F.lit(1)) >= 100,
                # NULL aggregate (sum over no matching rows) -> fail closed
                "null_agg": F.sum(F.when(F.col("id") > 99, F.col("v"))) > 0,
            },
        ).collect()
    }
    assert rep == {
        "min_rows": (True, False),
        "too_many_rows": (False, True),
        "null_agg": (False, True),
    }


def test_aggregate_gate_report_empty_checks(spark):
    from olist_lakehouse_2_0_spark.operators.expectations import (
        aggregate_gate_report,
    )

    df = spark.createDataFrame([(1,)], "id long")
    out = aggregate_gate_report(df, {})
    assert out.columns == ["rule", "passed", "gate_blocks"]
    assert out.count() == 0
