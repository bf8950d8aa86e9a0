"""Incremental file ingestion: Structured Streaming file source with
exactly-once checkpointing — the OSS equivalent of AutoLoader
streaming tables.

Reference semantics (C1, docs/ARCHITECTURE.md:227-232 +
resources/olist_pipeline.yml:24): each triggered run processes only
files that arrived since the last run, exactly once, tracked by the
stream checkpoint. ``trigger(availableNow=True)`` drains everything
available and stops — the triggered-pipeline execution mode.

Scale notes: the file-source checkpoint scales to millions of files
(compact log); ``maxFilesPerTrigger`` bounds micro-batch size so a
backlog doesn't produce one giant batch; downstream incremental tables
read the bronze output as their own stream, checkpointed independently
(S3 table-to-table streaming).
"""

from __future__ import annotations

import contextlib as _contextlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from olist_lakehouse_2_0_spark.sources.batch import (
    RESCUE_COL,
    _schema_with_rescue,
    with_audit_columns,
)


def read_csv_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    audit: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming CSV directory scan (S1, reference
    bronze/orders.sql:21-27)."""
    reader = (
        spark.readStream.schema(_schema_with_rescue(schema))
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", RESCUE_COL)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.csv(path)
    return with_audit_columns(df) if audit else df


def run_to_parquet(
    stream_df: DataFrame,
    output_path: str,
    checkpoint_path: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    mode: str = "append",
) -> None:
    """Drain all available input into a parquet streaming table
    (S5 sink shape) and stop — one triggered pipeline run."""
    df = transform(stream_df) if transform is not None else stream_df
    query = (
        df.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def run_foreach_batch(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_path: str,
) -> None:
    """Drain all available input through a foreachBatch sink (the CDC
    apply path — CdcSink plugs in here)."""
    query = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def full_refresh_reset(*paths: str) -> None:
    """Full-refresh semantics (reference olist_jobs.yml weekly job):
    delete checkpoints + targets so the next run reprocesses history."""
    import shutil

    for p in paths:
        if os.path.exists(p):
            shutil.rmtree(p)


@_contextlib.contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Temporarily size ``spark.sql.shuffle.partitions`` for a stateful
    streaming drain, restoring the session default afterwards.

    Stateful operators (dropDuplicates, stream-stream joins) allocate
    one state store per shuffle partition, and the partition count is
    FROZEN into the stream's checkpoint at first run — Spark's own
    guidance is to size it deliberately per stateful job rather than
    inherit the session default (state-store setup dominated a 32-
    partition drain: 22.5 s vs 4.6 s at 8 on the sf0.1 corpus). A real
    deployment sizes it to cluster parallelism instead."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
