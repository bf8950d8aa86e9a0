"""Scalar-function library: cleanse transforms + region maps
(reference silver-layer expressions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.functions.cleansing import (
    delivery_days,
    normalize_category,
    normalize_city,
    normalize_state,
    sentiment,
    size_category,
)
from olist_lakehouse_2_0_spark.functions.regions import (
    full_region,
    partial_region,
)


def test_cleansing(spark):
    df = spark.createDataFrame(
        [(" sao paulo ", " sp ", "home_appliances", 5, "2017-01-01 10:00:00", "2017-01-11 10:00:00")],
        "city string, state string, category string, score int, purchase string, delivered string",
    )
    row = df.select(
        normalize_city("city").alias("city"),
        normalize_state("state").alias("state"),
        normalize_category("category").alias("category"),
        sentiment("score").alias("sentiment"),
        delivery_days(F.to_timestamp("purchase"), F.to_timestamp("delivered")).alias("days"),
    ).collect()[0]
    assert row.city == "Sao Paulo"
    assert row.state == "SP"
    assert row.category == "home appliances"
    assert row.sentiment == "positive"
    assert row.days == 10


def test_sentiment_bands(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,), (5,), (None,)], "score int")
    got = {r.score: r.s for r in df.select("score", sentiment("score").alias("s")).collect()}
    assert got == {1: "negative", 2: "negative", 3: "neutral", 4: "positive", 5: "positive", None: None}


def test_size_category(spark):
    df = spark.createDataFrame([(500,), (5000,), (50000,), (500000,), (None,)], "v int")
    got = {r.v: r.s for r in df.select("v", size_category("v").alias("s")).collect()}
    assert got == {500: "small", 5000: "medium", 50000: "large", 500000: "extra_large", None: None}


def test_region_maps_differ_per_site(spark):
    df = spark.createDataFrame([("SP",), ("GO",), ("AM",), ("XX",)], "state string")
    rows = df.select(
        "state",
        full_region("state").alias("full"),
        partial_region("state").alias("partial"),
    ).collect()
    got = {r.state: (r.full, r.partial) for r in rows}
    assert got["SP"] == ("Southeast", "Southeast")
    # gold-layer map deliberately omits Midwest/North (SURVEY §7.4)
    assert got["GO"] == ("Midwest", "Other")
    assert got["AM"] == ("North", "Other")
    assert got["XX"] == ("Other", "Other")
