"""as-of join semantics: backward match, equal-ts inclusion, strict
mode, unmatched rows."""

from __future__ import annotations

import datetime as dt

from olist_lakehouse_2_0_spark.operators.asof import asof_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_backward_and_ties(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "l10"), (1, _ts(20), "l20"), (2, _ts(5), "l5")],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "r10"), (1, _ts(15), "r15"), (3, _ts(1), "r1")],
        ["k", "ts", "rv"],
    )
    got = {
        (r.k, r.lv): r.matched_rv
        for r in asof_join(left, right, key="k").collect()
    }
    # equal ts matches (non-strict); 20 sees the latest (15); key 2 unmatched
    assert got == {(1, "l10"): "r10", (1, "l20"): "r15", (2, "l5"): None}


def test_asof_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame([(1, _ts(10), "l")], ["k", "ts", "lv"])
    right = spark.createDataFrame(
        [(1, _ts(10), "r_eq"), (1, _ts(9), "r_prev")], ["k", "ts", "rv"]
    )
    rows = asof_join(left, right, key="k", strict=True).collect()
    assert rows[0].matched_rv == "r_prev"


def test_interval_join_bucket_boundaries(spark):
    """Pairs straddling a bucket boundary and exactly at the window
    edge must match; beyond-window must not."""
    from olist_lakehouse_2_0_spark.operators.asof import interval_join

    left = spark.createDataFrame(
        [(1, _ts(59), "l")], ["k", "ts", "lv"]
    )
    right = spark.createDataFrame(
        [(1, _ts(59), "same"), (1, _ts(61), "next_bucket"),
         (1, _ts(59 + 60), "edge"), (1, _ts(59 + 61), "beyond"),
         (1, _ts(58), "before")],
        ["k", "ts", "rv"],
    )
    got = {
        r.matched_rv
        for r in interval_join(
            left, right, key="k", left_ts="ts", right_ts="ts", upper_seconds=60
        ).collect()
    }
    assert got == {"same", "next_bucket", "edge"}
