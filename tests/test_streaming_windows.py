"""Streaming window operators: the SAME functions that back the batch
event queries, driven through readStream + watermark + availableNow.

Verifies batch/stream unification: a watermarked streaming run over a
static parquet directory must produce exactly the batch answer once the
stream drains (availableNow processes everything, then the final
watermark closes all windows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.catalog import load
from olist_lakehouse_2_0_spark.streaming.windows import (
    sessionize,
    tumbling_window_agg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events re-staged as micros-timestamp parquet (a streamable source
    directory; the raw testdata is TIMESTAMP(NANOS) which needs the
    batch-only legacy read flag)."""
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    load(spark, SF, "events").write.parquet(path)
    return path


def _drain(stream_df, spark, tmp_path, name):
    """Run a streaming aggregation to completion into a memory sink."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, events_dir, tmp_path):
    batch = load(spark, SF, "events")
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)

    expected = tumbling_window_agg(batch, distinct_users=False)
    got = _drain(
        tumbling_window_agg(
            stream.withWatermark("ts", "0 seconds"), distinct_users=False
        ),
        spark,
        tmp_path,
        "tumbling_stream",
    )
    # availableNow emits closed windows; the last (still-open) window is
    # withheld by the watermark, so compare on the batch side restricted
    # to windows the stream closed.
    got_rows = _rows(got)
    assert got_rows, "stream produced no closed windows"
    max_ws = max(r[0] for r in got_rows)
    exp_rows = [r for r in _rows(expected) if r[0] <= max_ws]
    assert got_rows == exp_rows


def test_session_stream_matches_batch(spark, events_dir, tmp_path):
    batch = load(spark, SF, "events")
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)

    expected = sessionize(batch, gap="30 minutes")
    got = _drain(
        sessionize(stream.withWatermark("ts", "0 seconds"), gap="30 minutes"),
        spark,
        tmp_path,
        "session_stream",
    )
    got_rows = _rows(got)
    assert got_rows, "stream produced no closed sessions"
    max_end = max(r[2] for r in got_rows)  # session_end
    exp_rows = [r for r in _rows(expected) if r[2] <= max_end]
    assert got_rows == exp_rows


def test_sketch_profile_accuracy(spark):
    """Approx sketches must land within tolerance of exact answers."""
    from olist_lakehouse_2_0_spark.queries.event_queries import (
        events_sketch_profile,
    )

    got = {r.event_type: r for r in events_sketch_profile(spark, SF).collect()}
    exact = {
        r.event_type: r
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for t, e in exact.items():
        assert abs(got[t].approx_users - e.users) <= max(2, 0.05 * e.users)
        assert abs(got[t].value_p50_p95[0] - e.p50) <= 0.05 * max(1.0, e.p50)


def test_dedupe_stream_drops_redelivery(spark, tmp_path):
    """Streaming dropDuplicates + watermark: a duplicate event_id
    re-delivered in a later micro-batch (within the watermark) is
    dropped; distinct ids all survive."""
    import datetime as dt

    from pyspark.sql import functions as F

    from olist_lakehouse_2_0_spark.streaming.windows import dedupe_stream

    landing = tmp_path / "landing"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()
    schema = "event_id long, ts timestamp, value double"
    base = dt.datetime(2024, 1, 1, 12, 0)

    b1 = [(1, base, 1.0), (2, base + dt.timedelta(minutes=1), 2.0)]
    # batch 2 re-delivers event 1 (same id) and adds event 3
    b2 = [(1, base, 1.0), (3, base + dt.timedelta(minutes=2), 3.0)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(landing / "b1")
    )
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(landing / "b2")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    deduped = dedupe_stream(stream, keys=("event_id",), watermark="1 hour")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(str(out))
    assert got.count() == 3  # events 1, 2, 3 — re-delivery dropped
    assert got.select("event_id").distinct().count() == 3
