"""Synthetic-data generator invariants, mirroring the reference's own
generator test strategy (reference tests/unit/test_data_generator.py:
86-102 id shape/uniqueness, 161-188 CDC mix + monotonic sequences,
294-360 bad-data injection classes) — plus determinism, which the
reference's RNG-based generator cannot promise."""

from __future__ import annotations

from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark import datagen as G
from olist_lakehouse_2_0_spark.operators.expectations import (
    enforce,
    expect_or_drop,
)

N = 2000


def test_ids_unique_and_shaped(spark):
    customers = G.gen_customers(spark, N, bad_rate=0.0)
    assert customers.count() == N
    assert customers.select("customer_id").distinct().count() == N
    assert (
        customers.filter(F.length("customer_id") != 32).count() == 0
    )


def test_determinism_across_runs(spark):
    a = G.gen_orders(spark, 500, n_customers=100)
    b = G.gen_orders(spark, 500, n_customers=100)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_referential_integrity_without_joins(spark):
    customers = G.gen_customers(spark, 300, bad_rate=0.0)
    orders = G.gen_orders(spark, 1000, n_customers=300, bad_rate=0.0)
    orphans = orders.join(
        customers.select("customer_id"), "customer_id", "left_anti"
    )
    assert orphans.count() == 0


def test_corrupted_parent_ids_orphan_their_children(spark):
    """Bad-id injection on the parent deliberately orphans child rows
    (corrupt upstream ids do exactly this); the orphan share tracks the
    parent bad rate, scaled by each parent's child fan-in."""
    customers = G.gen_customers(spark, 300, bad_rate=0.02)
    orders = G.gen_orders(spark, 1000, n_customers=300, bad_rate=0.0)
    orphans = orders.join(
        customers.select("customer_id"), "customer_id", "left_anti"
    ).count()
    assert 0 < orphans < 0.1 * 1000


def test_bad_rate_injection_bounds(spark):
    orders = G.gen_orders(spark, N, n_customers=100, bad_rate=0.02)
    bad = orders.filter(F.col("order_status") == "INVALID_STATUS").count()
    assert 0.01 * N < bad < 0.03 * N
    clean = G.gen_orders(spark, N, n_customers=100, bad_rate=0.0)
    assert clean.filter(F.col("order_status") == "INVALID_STATUS").count() == 0


def test_expectations_catch_exactly_the_injected_rows(spark):
    items = G.gen_order_items(
        spark, N, n_orders=500, n_products=100, n_sellers=20, bad_rate=0.02
    )
    injected = items.filter(F.col("price") < 0).count()
    assert injected > 0
    result = enforce(
        items, [expect_or_drop("positive_price", F.col("price") > 0)]
    )
    kept = result.df.count()
    assert kept == N - injected
    assert result.metrics()["positive_price"] == injected


def test_review_scores_in_range_unless_injected(spark):
    reviews = G.gen_reviews(spark, N, n_orders=500, bad_rate=0.02)
    out_of_range = reviews.filter(~F.col("review_score").between(1, 5))
    assert 0 < out_of_range.count() < 0.03 * N
    assert out_of_range.filter(F.col("review_score") != 11).count() == 0


def test_cdc_mix_and_monotonic_sequence(spark):
    cdc = G.gen_cdc_changes(spark, N, n_entities=100, start_sequence=50)
    ops = {
        r["operation"]: r["n"]
        for r in cdc.groupBy("operation").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0.5 * N < ops["INSERT"] < 0.7 * N
    assert 0.2 * N < ops["UPDATE"] < 0.4 * N
    assert 0.05 * N < ops["DELETE"] < 0.15 * N
    seqs = cdc.agg(
        F.min("sequence_number").alias("lo"),
        F.max("sequence_number").alias("hi"),
        F.countDistinct("sequence_number").alias("n"),
    ).first()
    # unique, gap-free, offset by start_sequence
    assert (seqs["lo"], seqs["hi"], seqs["n"]) == (50, 50 + N - 1, N)


def test_landing_csv_roundtrip(spark, tmp_path):
    payments = G.gen_payments(spark, 500, n_orders=200, bad_rate=0.0)
    path = str(tmp_path / "payments_csv")
    G.write_landing_csv(payments, path)
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == 500
    assert set(back.columns) == set(payments.columns)
