"""CDC/SCD driver-contract queries over the ``events`` testdata table.

The events stream is interpreted as a CDC feed (FIXTURES.md §4 mapping:
events ≈ CDC feed): key = user_id, sequence = event_id, and operation
derived from event_type (signup -> INSERT, error -> DELETE, everything
else -> UPDATE). The engine's apply_changes operators
(operators/cdc.py) produce the SCD1 snapshot / SCD2 history; the DuckDB
oracles express the same semantics with window functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.catalog import load
from olist_lakehouse_2_0_spark.operators.cdc import (
    ChangeSpec,
    scd1_snapshot,
    scd2_history,
)

EVENT_SPEC = ChangeSpec(
    keys=("user_id",),
    sequence_by=("event_id",),
    operation_col="__op",
    delete_ops=("DELETE",),
    except_columns=("props",),
)


def _as_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events", spread=True)
    op = (
        F.when(F.col("event_type") == "signup", "INSERT")
        .when(F.col("event_type") == "error", "DELETE")
        .otherwise("UPDATE")
    )
    return events.withColumn("__op", op)


def scd1_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 1: latest state per user; a trailing 'error' removes the
    user (C2, reference cdc_customers_silver.sql:54-61)."""
    feed = _as_change_feed(spark, sf_dir)
    snap = scd1_snapshot(feed, EVENT_SPEC)
    # __seq == event_id for single-column sequences; surface it as a
    # normal column for the oracle comparison.
    return snap.select(
        "user_id",
        F.col("__seq").alias("last_event_id"),
        F.col("ts").alias("last_change_ts"),
        F.col("event_type").alias("last_event_type"),
        "value",
    )


SCD1_USERS_SQL = """
WITH feed AS (
  SELECT user_id, event_id, ts, event_type, value,
         CASE event_type WHEN 'signup' THEN 'INSERT'
                         WHEN 'error' THEN 'DELETE'
                         ELSE 'UPDATE' END AS op
  FROM events
), latest AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM feed
)
SELECT user_id,
       event_id AS last_event_id,
       ts AS last_change_ts,
       event_type AS last_event_type,
       value
FROM latest
WHERE rn = 1 AND op <> 'DELETE'
"""


def scd2_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2: full version history with __start_at/__end_at/
    __is_current; deletes close the open version (C3/C5, reference
    cdc_customers_silver.sql:78-85, docs/CDC_GUIDE.md:250-258)."""
    feed = _as_change_feed(spark, sf_dir)
    hist = scd2_history(feed, EVENT_SPEC)
    return hist.select(
        "user_id",
        F.col("ts").alias("change_ts"),
        F.col("event_type"),
        "value",
        F.col("__start_at").alias("start_at"),
        F.col("__end_at").alias("end_at"),
        F.col("__is_current").alias("is_current"),
    )


SCD2_USERS_SQL = """
WITH feed AS (
  SELECT user_id, event_id, ts, event_type, value,
         CASE event_type WHEN 'signup' THEN 'INSERT'
                         WHEN 'error' THEN 'DELETE'
                         ELSE 'UPDATE' END AS op
  FROM feed_base
), versioned AS (
  SELECT user_id, ts, event_type, value, op,
         event_id AS start_at,
         LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS end_at
  FROM feed
)
SELECT user_id, ts AS change_ts, event_type, value, start_at, end_at,
       end_at IS NULL AS is_current
FROM versioned
WHERE op <> 'DELETE'
"""
# feed_base is just `events`; DuckDB CTE naming kept flat:
SCD2_USERS_SQL = SCD2_USERS_SQL.replace("FROM feed_base", "FROM events")


def scd2_users_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL SCD2 merge path under the oracle gate (C2–C5):
    the change feed is re-staged as three hash-split parquet files and
    streamed one file per micro-batch through ``CdcSink`` — so each
    user's events arrive scattered across batches, OUT of sequence
    order — into a parquet SCD2 target via the read-merge-swap apply.
    The final history must equal the in-order batch rebuild the oracle
    computes: out-of-order resolution (C4), deletes closing versions
    (C5), and multi-batch merge idempotence are all inside the hash
    check. (``scd2_users`` verifies the one-shot batch path; this one
    verifies the streaming merge.)"""
    import os

    from olist_lakehouse_2_0_spark.operators.cdc import CdcSink
    from olist_lakehouse_2_0_spark.staging import staging_dir
    from olist_lakehouse_2_0_spark.streaming.ingest import run_foreach_batch

    feed = _as_change_feed(spark, sf_dir).select(
        "user_id", "event_id", "ts", "event_type", "value", "props", "__op"
    )
    root = staging_dir("scd2_inc")
    landing = os.path.join(root, "landing")
    # Hash-split into 3 files: each micro-batch carries an arbitrary
    # slice of every user's history (out-of-order arrival guaranteed).
    feed.repartition(3).write.parquet(landing)

    stream = (
        spark.readStream.schema(spark.read.parquet(landing).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    target = os.path.join(root, "scd2")
    sink = CdcSink(target, EVENT_SPEC, scd_type=2)
    run_foreach_batch(stream, sink, os.path.join(root, "ckpt"))

    hist = spark.read.parquet(target)
    return hist.select(
        "user_id",
        F.col("ts").alias("change_ts"),
        F.col("event_type"),
        "value",
        F.col("__start_at").alias("start_at"),
        F.col("__end_at").alias("end_at"),
        F.col("__is_current").alias("is_current"),
    )


def scd1_users_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental SCD1 merge path under the oracle gate (C2/C4/C5
    streaming variant): same three hash-split micro-batches as
    :func:`scd2_users_incremental`, applied through ``CdcSink``
    (scd_type=1) with the delete-tombstone sidecar; the final snapshot
    must equal the in-order batch rebuild the oracle computes."""
    import os

    from olist_lakehouse_2_0_spark.operators.cdc import CdcSink
    from olist_lakehouse_2_0_spark.staging import staging_dir
    from olist_lakehouse_2_0_spark.streaming.ingest import run_foreach_batch

    feed = _as_change_feed(spark, sf_dir).select(
        "user_id", "event_id", "ts", "event_type", "value", "props", "__op"
    )
    root = staging_dir("scd1_inc")
    landing = os.path.join(root, "landing")
    feed.repartition(3).write.parquet(landing)

    stream = (
        spark.readStream.schema(spark.read.parquet(landing).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    target = os.path.join(root, "scd1")
    sink = CdcSink(target, EVENT_SPEC, scd_type=1)
    run_foreach_batch(stream, sink, os.path.join(root, "ckpt"))

    snap = spark.read.parquet(target)
    return snap.select(
        "user_id",
        F.col("__seq").alias("last_event_id"),
        F.col("ts").alias("last_change_ts"),
        F.col("event_type").alias("last_event_type"),
        "value",
    )


CDC_QUERIES = {
    "scd1_users": scd1_users,
    "scd2_users": scd2_users,
    "scd2_users_incremental": scd2_users_incremental,
    "scd1_users_incremental": scd1_users_incremental,
}
CDC_ORACLES = {
    "scd1_users": SCD1_USERS_SQL,
    "scd2_users": SCD2_USERS_SQL,
    "scd2_users_incremental": SCD2_USERS_SQL,
    "scd1_users_incremental": SCD1_USERS_SQL,
}
