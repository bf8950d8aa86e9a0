"""Stream-stream interval join: watermarked streaming run over a static
parquet directory must reproduce the batch interval-join answer once
the stream drains (availableNow + inner join emits matches as both
sides' watermarks pass them).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.catalog import load
from olist_lakehouse_2_0_spark.streaming.joins import stream_interval_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events re-staged as micros-timestamp parquet (streamable source;
    raw testdata is TIMESTAMP(NANOS), batch-only)."""
    path = str(tmp_path_factory.mktemp("events_join") / "events")
    load(spark, SF, "events").write.parquet(path)
    return path


def _split(events):
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id"),
        F.col("event_id").alias("error_event_id"),
        F.col("ts").alias("error_ts"),
    )
    return clicks, errors


def test_stream_interval_join_matches_batch(spark, events_dir, tmp_path):
    batch = load(spark, SF, "events").filter(F.col("ts").isNotNull())
    schema = batch.schema
    stream = spark.readStream.schema(schema).parquet(events_dir).filter(
        F.col("ts").isNotNull()
    )

    b_clicks, b_errors = _split(batch)
    expected = sorted(
        (r["event_id"], r["error_event_id"])
        for r in stream_interval_join(
            b_clicks, b_errors, right_ts="error_ts", upper_seconds=300
        ).collect()
    )
    assert expected, "batch interval join found no pairs at sf0.001"

    s_clicks, s_errors = _split(stream)
    q = (
        stream_interval_join(
            s_clicks, s_errors, right_ts="error_ts", upper_seconds=300
        )
        .writeStream.format("memory")
        .queryName("stream_ij")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ij"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["event_id"], r["error_event_id"])
        for r in spark.table("stream_ij").collect()
    )
    assert got == expected


def test_stream_static_enrich_matches_batch_and_keeps_misses(
    spark, events_dir, tmp_path
):
    """Stream-static broadcast enrichment: streaming answer equals the
    batch join, and dimension misses keep the fact row (NULL attrs)."""
    from olist_lakehouse_2_0_spark.streaming.joins import stream_static_enrich

    batch = load(spark, SF, "events")
    # dimension covering only half the users — the rest must survive
    # with NULL attributes
    dim = (
        batch.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 2 == 0)
        .withColumn("user_tier", F.lit("even"))
    )
    expected = sorted(
        (r["event_id"], r["user_tier"])
        for r in stream_static_enrich(batch, dim, "user_id").collect()
    )
    assert any(t is None for _, t in expected), "no dimension misses"
    assert any(t == "even" for _, t in expected)

    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    q = (
        stream_static_enrich(stream, dim, "user_id")
        .writeStream.format("memory")
        .queryName("stream_enrich")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["event_id"], r["user_tier"])
        for r in spark.table("stream_enrich").collect()
    )
    assert got == expected


def test_stream_interval_join_batch_twin_agrees_with_bucketed(spark):
    """The watermark join's batch degradation must agree with the
    bucketed equi-join interval_join used by the batch query path."""
    from olist_lakehouse_2_0_spark.operators.asof import interval_join

    events = load(spark, SF, "events").filter(F.col("ts").isNotNull())
    clicks, errors = _split(events)
    theta = sorted(
        (r["event_id"], r["error_event_id"])
        for r in stream_interval_join(
            clicks, errors, right_ts="error_ts", upper_seconds=300
        ).collect()
    )
    bucketed = sorted(
        (r["event_id"], r["matched_error_event_id"])
        for r in interval_join(
            clicks,
            errors,
            key="user_id",
            left_ts="ts",
            right_ts="error_ts",
            upper_seconds=300,
        ).collect()
    )
    assert theta == bucketed
