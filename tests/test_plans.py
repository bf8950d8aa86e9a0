"""Plan-shape regression tests: the optimizations we rely on must be
visible in the physical plan, not assumed — filter pushdown reaching
the parquet scan, column pruning, broadcast dimensions, and no
sort-merge joins where broadcast cascades are intended."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _formatted_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark):
    from olist_lakehouse_2_0_spark.queries.analytics import (
        pricing_summary,
        revenue_by_nation,
    )
    from olist_lakehouse_2_0_spark.queries.relational import seller_performance

    return {
        "pricing_summary": _formatted_plan(pricing_summary(spark, SF)),
        "revenue_by_nation": _formatted_plan(revenue_by_nation(spark, SF)),
        "seller_performance": _formatted_plan(seller_performance(spark, SF)),
    }


def test_pricing_summary_pushes_filter_to_scan(plans):
    plan = plans["pricing_summary"]
    assert "LessThanOrEqual(l_shipdate" in plan  # PushedFilters
    # Column pruning: the scan must not read join keys it doesn't need.
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema


def test_revenue_by_nation_broadcasts_dimensions(plans):
    plan = plans["revenue_by_nation"]
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # The dimension filter reaches the region scan.
    assert "EqualTo(r_name,ASIA)" in plan
    # Order-date range predicates push into the orders scan.
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_seller_performance_broadcasts_supplier(plans):
    plan = plans["seller_performance"]
    assert "BroadcastExchange" in plan
    # Supplier scan reads only the join key + name.
    supplier_reads = [
        l for l in plan.splitlines() if "ReadSchema" in l and "s_name" in l
    ]
    assert supplier_reads and all("s_acctbal" not in l for l in supplier_reads)
