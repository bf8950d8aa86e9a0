"""as-of join semantics: backward match, equal-ts inclusion, strict
mode, unmatched rows."""

from __future__ import annotations

import datetime as dt

from olist_lakehouse_2_0_spark.operators.asof import asof_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


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
