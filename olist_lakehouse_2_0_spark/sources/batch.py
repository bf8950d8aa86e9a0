"""Batch file sources with schema enforcement, rescued-data capture and
file-metadata audit columns.

Re-implements the reference's bronze-layer read surface
(``read_files(dir, format => 'csv', header => true, ...,
rescuedDataColumn => '_rescued_data')`` + ``_metadata`` projections,
reference src/pipelines/bronze/orders.sql:16-27) on OSS Spark:

- Explicit ``StructType`` per source (preferred at scale — schema
  inference reads the data twice and can silently widen types).
- PERMISSIVE mode with ``columnNameOfCorruptRecord`` standing in for
  AutoLoader's ``_rescued_data``: malformed rows land with the raw line
  captured instead of failing the batch.
- ``_metadata.file_path`` / ``_metadata.file_modification_time`` map to
  the same hidden ``_metadata`` struct OSS Spark exposes on file
  sources; audit columns are appended exactly as the reference does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESCUE_COL = "_rescued_data"


def with_audit_columns(df: DataFrame) -> DataFrame:
    """Bronze audit columns (reference bronze/orders.sql:18-20):
    _source_file, _file_modified_at, _ingested_at."""
    return df.select(
        "*",
        F.col("_metadata.file_path").alias("_source_file"),
        F.col("_metadata.file_modification_time").alias("_file_modified_at"),
        F.current_timestamp().alias("_ingested_at"),
    )


def _schema_with_rescue(schema: T.StructType) -> T.StructType:
    if RESCUE_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(RESCUE_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    audit: bool = True,
) -> DataFrame:
    """Batch CSV read with rescue column + audit columns — the batch
    fallback for the bronze streaming scan (S1)."""
    df = (
        spark.read.schema(_schema_with_rescue(schema))
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", RESCUE_COL)
        .csv(path)
    )
    return with_audit_columns(df) if audit else df


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    audit: bool = True,
) -> DataFrame:
    """Batch JSON-lines read with the same rescue + audit contract as
    the CSV source: malformed lines land in ``_rescued_data`` instead
    of failing the batch (PERMISSIVE), well-formed extra fields are
    dropped by the explicit schema (pin the schema at scale — JSON
    inference samples the data and can flap between runs). This is the
    ingestion format of most web-scraped / API-exported text corpora,
    so a training-data pipeline needs it next to CSV."""
    df = (
        spark.read.schema(_schema_with_rescue(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", RESCUE_COL)
        .json(path)
    )
    return with_audit_columns(df) if audit else df


def read_text(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    audit: bool = True,
) -> DataFrame:
    """Raw text read for unstructured corpora: one row per line
    (``value: string``), or one row per FILE with ``whole_file=True``
    (document-per-file corpora). Whole-file mode cannot split a file
    across tasks — at 100 TB keep individual documents well under the
    task memory budget and let parallelism come from file count."""
    df = spark.read.text(path, wholetext=whole_file)
    return with_audit_columns(df) if audit else df


def read_orc(
    spark: SparkSession,
    path: str,
    audit: bool = False,
) -> DataFrame:
    """Batch ORC read — the other columnar lake format (vectorized
    reader, predicate pushdown and column pruning same as parquet).
    Kept in the source matrix so tables produced by Hive-lineage
    pipelines plug in without conversion."""
    df = spark.read.orc(path)
    return with_audit_columns(df) if audit else df


def read_parquet(
    spark: SparkSession,
    path: str,
    audit: bool = False,
    merge_schema: bool = False,
) -> DataFrame:
    """Batch parquet read (S4). ``merge_schema=True`` reconciles files
    written under evolving schemas (added nullable columns backfill as
    NULL) — the schema-evolution path a long-lived bronze table needs.
    Off by default: merging scans every file footer, which on a
    100 TB table is a driver-side listing storm; enable it only on
    tables that actually evolve, or pin an explicit schema."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)
    return with_audit_columns(df) if audit else df
