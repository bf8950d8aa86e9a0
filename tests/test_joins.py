"""Salted-join skew mitigation: identical semantics to a plain join,
rows of a hot key spread across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.operators.joins import salted_join


def _skewed_fixture(spark):
    # 90% of fact rows share key 0 (pathological producer skew).
    fact = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


def test_salted_inner_matches_plain_join(spark):
    fact, dim = _skewed_fixture(spark)
    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_join(fact, dim, "k", salt=8).select("k", "v", "name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_preserves_unmatched(spark):
    fact, dim = _skewed_fixture(spark)
    dim_missing = dim.filter(F.col("k") != 0)  # hot key has no dim row
    plain = fact.join(dim_missing, "k", "left").select("k", "v", "name")
    salted = salted_join(fact, dim_missing, "k", salt=8, how="left").select(
        "k", "v", "name"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salt_spreads_hot_key(spark):
    fact, dim = _skewed_fixture(spark)
    salt_col = F.pmod(
        F.xxhash64(F.col("k"), F.monotonically_increasing_id()), F.lit(8)
    ).cast("int")
    dist = (
        fact.filter(F.col("k") == 0)
        .withColumn("__salt", salt_col)
        .groupBy("__salt")
        .count()
        .collect()
    )
    counts = {r["__salt"]: r["count"] for r in dist}
    assert len(counts) == 8  # hot key occupies all salt buckets
    assert max(counts.values()) < 0.9 * 9000  # no bucket re-concentrates


def test_range_join_matches_between_semantics(spark):
    """Bucketed range join must equal the naive BETWEEN join, including
    boundary behavior (start inclusive, end exclusive), intervals
    spanning multiple buckets, and empty intervals matching nothing."""
    from olist_lakehouse_2_0_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [(i,) for i in range(0, 50)], "p long"
    )
    intervals = spark.createDataFrame(
        [
            (1, 5, 8),     # within one bucket
            (2, 9, 23),    # spans buckets
            (3, 30, 30),   # empty
            (4, 48, 60),   # runs past the data
        ],
        "iid long, s long, e long",
    )
    got = {
        (r["iid"], r["p"])
        for r in range_join(points, intervals, "p", "s", "e", 7).collect()
    }
    expected = {
        (iid, p)
        for iid, s, e in [(1, 5, 8), (2, 9, 23), (3, 30, 30), (4, 48, 60)]
        for p in range(50)
        if s <= p < e
    }
    assert got == expected
    assert all(not (iid == 3) for iid, _ in got)


def test_range_join_fractional_values(spark):
    """Fractional (double) points/intervals: the last candidate bucket
    is floor(end/width), so a point in the interval's final partial
    bucket (e.g. 7.2 in [0, 7.5) with width 7) is matched."""
    from olist_lakehouse_2_0_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [(0.5,), (6.9,), (7.2,), (7.5,), (13.99,), (14.0,)], "p double"
    )
    intervals = spark.createDataFrame(
        [
            (1, 0.0, 7.5),    # fractional end inside bucket 1
            (2, 7.0, 14.0),   # end exactly on a bucket boundary
            (3, 6.5, 6.5),    # empty fractional interval
        ],
        "iid long, s double, e double",
    )
    got = {
        (r["iid"], r["p"])
        for r in range_join(points, intervals, "p", "s", "e", 7).collect()
    }
    expected = {
        (iid, p)
        for iid, s, e in [(1, 0.0, 7.5), (2, 7.0, 14.0), (3, 6.5, 6.5)]
        for p in [0.5, 6.9, 7.2, 7.5, 13.99, 14.0]
        if s <= p < e
    }
    assert (1, 7.2) in expected  # the regression case this test guards
    assert got == expected


def test_salted_agg_matches_plain_groupby(spark):
    """Two-phase salted aggregation must be invisible in the result:
    identical to the plain GROUP BY for every supported algebraic
    aggregate, including on a pathologically hot key."""
    from pyspark.sql import functions as F

    from olist_lakehouse_2_0_spark.operators.joins import salted_agg

    # key 'hot' holds 90% of the rows; 'a'/'b' are normal.
    rows = [("hot", i, float(i % 7)) for i in range(900)]
    rows += [("a", i, float(i)) for i in range(60)]
    rows += [("b", i, float(-i)) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, n long, v double")
    metrics = {
        "cnt": ("count", F.lit(1)),
        "total": ("sum", F.col("n")),
        "lo": ("min", F.col("v")),
        "hi": ("max", F.col("v")),
    }
    got = {
        r["k"]: (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in salted_agg(df, ["k"], metrics, salt=8).collect()
    }
    want = {
        r["k"]: (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_salted_agg_rejects_non_algebraic(spark):
    from pyspark.sql import functions as F

    from olist_lakehouse_2_0_spark.operators.joins import salted_agg

    df = spark.createDataFrame([("a", 1)], "k string, n long")
    import pytest

    with pytest.raises(ValueError, match="unsupported salted aggregate"):
        salted_agg(df, ["k"], {"d": ("count_distinct", F.col("n"))})
