"""Bucketed-table co-location: joins and aggregations on the bucket
key must not shuffle (no Exchange operator on the bucketed sides)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.catalog import Catalog


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    orders = spark.range(0, 10000).select(
        F.col("id").alias("order_id"),
        (F.col("id") % 100).alias("cust_id"),
        (F.col("id") * 3 % 500).cast("double").alias("amount"),
    )
    items = spark.range(0, 30000).select(
        (F.col("id") % 10000).alias("order_id"),
        (F.col("id") % 7).alias("qty"),
    )
    cat.write_bucketed(orders, "b_orders", ["order_id"], num_buckets=8)
    cat.write_bucketed(items, "b_items", ["order_id"], num_buckets=8)
    yield cat
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    a = spark.table("b_orders")
    b = spark.table("b_items")
    # Disable broadcast so the join would otherwise be a shuffle join.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "order_id")
        plan = _physical_plan(joined)
        assert "Exchange" not in plan, plan
        # Result correctness: every item matches exactly one order.
        assert joined.count() == 30000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    a = spark.table("b_orders")
    agg = a.groupBy("order_id").agg(F.sum("amount").alias("total"))
    plan = _physical_plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 10000


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join on plain DataFrames exchanges both sides."""
    a = spark.table("b_orders")
    plain = spark.range(0, 10000).select(F.col("id").alias("order_id"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _physical_plan(a.join(plain, "order_id"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_write_bucketed_append_preserves_existing_rows(spark):
    """The orphan-cleanup (drop + warehouse delete) must be scoped to
    mode=overwrite: an append to an existing bucketed table previously
    erased it before the mode was consulted."""
    from olist_lakehouse_2_0_spark.catalog import Catalog

    cat = Catalog(root=spark.conf.get("spark.sql.warehouse.dir"))
    df1 = spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v")
    df2 = spark.range(10, 15).selectExpr("id AS k", "id * 2 AS v")
    cat.write_bucketed(df1, "bkt_append_t", ["k"], num_buckets=4)
    cat.write_bucketed(df2, "bkt_append_t", ["k"], num_buckets=4, mode="append")
    assert spark.table("bkt_append_t").count() == 15
    # overwrite still replaces wholesale (and clears any orphan dir)
    cat.write_bucketed(df2, "bkt_append_t", ["k"], num_buckets=4)
    assert spark.table("bkt_append_t").count() == 5
    spark.sql("DROP TABLE IF EXISTS bkt_append_t")
