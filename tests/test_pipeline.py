"""End-to-end pipeline: bronze (streaming CSV, exactly-once) -> silver
(cleanse + DROP expectations) -> gold (agg + FAIL gate), mirroring the
reference's main ETL pipeline on Olist-shaped synthetic data with ~2%
injected violations (FIXTURES.md §1/§3)."""

from __future__ import annotations

import csv
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olist_lakehouse_2_0_spark.catalog import Catalog
from olist_lakehouse_2_0_spark.functions.cleansing import normalize_state
from olist_lakehouse_2_0_spark.operators.expectations import (
    ExpectationFailed,
    expect_or_drop,
    expect_or_fail,
)
from olist_lakehouse_2_0_spark.plans.pipeline import (
    Materialization,
    Pipeline,
    TableDef,
)
from olist_lakehouse_2_0_spark.streaming.ingest import read_csv_stream

ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("customer_state", T.StringType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("price", T.StringType()),
    ]
)

BATCH1 = [
    ("a" * 32, "sp", "delivered", "100.50"),
    ("b" * 32, "RJ", "shipped", "40.00"),
    ("c" * 32, "mg", "delivered", "59.90"),
    ("BAD", "SP", "delivered", "10.00"),          # short id -> dropped
    ("d" * 32, "RS", "INVALID_STATUS", "20.00"),  # bad status -> dropped
]
BATCH2 = [
    ("e" * 32, "SP", "delivered", "75.25"),
    ("f" * 32, "BA", "canceled", "30.00"),
]


def _write_csv(directory: str, name: str, rows) -> None:
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, name), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["order_id", "customer_state", "order_status", "price"])
        w.writerows(rows)


VALID_STATUSES = (
    "created approved invoiced processing shipped delivered unavailable canceled".split()
)


def _build_pipeline(root: str, raw_dir: str) -> Pipeline:
    catalog = Catalog(root=root)

    bronze = TableDef(
        name="bronze_orders",
        inputs=("raw_orders",),
        build=lambda ins: ins["raw_orders"],
        materialization=Materialization.STREAMING_TABLE,
        layer="bronze",
    )
    silver = TableDef(
        name="silver_orders",
        inputs=("bronze_orders",),
        build=lambda ins: ins["bronze_orders"].select(
            F.trim("order_id").alias("order_id"),
            normalize_state("customer_state").alias("customer_state"),
            F.lower(F.trim("order_status")).alias("order_status"),
            F.col("price").cast("decimal(10,2)").alias("price"),
            F.current_timestamp().alias("_processed_at"),
        ),
        expectations=[
            expect_or_drop("valid_order_id", F.length("order_id") == 32),
            expect_or_drop("valid_status", F.col("order_status").isin(VALID_STATUSES)),
            expect_or_drop("valid_price", F.col("price") >= 0),
        ],
        materialization=Materialization.STREAMING_TABLE,
        layer="silver",
    )
    gold = TableDef(
        name="gold_state_orders",
        inputs=("silver_orders",),
        build=lambda ins: ins["silver_orders"]
        .groupBy("customer_state")
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.sum("price").cast("decimal(18,2)").alias("total_revenue"),
        ),
        expectations=[expect_or_fail("non_negative_revenue", F.col("total_revenue") >= 0)],
        materialization=Materialization.MATERIALIZED_VIEW,
        layer="gold",
    )
    return Pipeline("olist_main", catalog, [bronze, silver, gold])


def test_end_to_end_incremental(spark, tmp_path):
    root = str(tmp_path / "lake")
    raw = str(tmp_path / "raw" / "orders")
    _write_csv(raw, "batch1.csv", BATCH1)

    pipe = _build_pipeline(root, raw)
    external = {"raw_orders": read_csv_stream(spark, raw, ORDER_SCHEMA)}
    result = pipe.run(spark, external_inputs=external)
    assert set(result.written) == {"bronze_orders", "silver_orders", "gold_state_orders"}

    bronze_df = spark.read.parquet(result.written["bronze_orders"])
    assert bronze_df.count() == 5  # bronze keeps everything (WARN layer)
    assert {"_source_file", "_file_modified_at", "_ingested_at"} <= set(bronze_df.columns)

    silver_df = spark.read.parquet(result.written["silver_orders"])
    assert silver_df.count() == 3  # 2 violations dropped
    assert {r.customer_state for r in silver_df.collect()} == {"SP", "RJ", "MG"}

    gold_df = spark.read.parquet(result.written["gold_state_orders"])
    assert gold_df.count() == 3
    sp = [r for r in gold_df.collect() if r.customer_state == "SP"][0]
    assert float(sp.total_revenue) == 100.50

    # --- incremental run: only the new file is processed ---
    _write_csv(raw, "batch2.csv", BATCH2)
    result2 = pipe.run(spark, external_inputs={
        "raw_orders": read_csv_stream(spark, raw, ORDER_SCHEMA)
    })
    bronze2 = spark.read.parquet(result2.written["bronze_orders"])
    assert bronze2.count() == 7  # 5 + 2, batch1 NOT reprocessed
    silver2 = spark.read.parquet(result2.written["silver_orders"])
    assert silver2.count() == 5
    gold2 = spark.read.parquet(result2.written["gold_state_orders"])
    ba = [r for r in gold2.collect() if r.customer_state == "BA"]
    assert len(ba) == 1 and float(ba[0].total_revenue) == 30.00


def test_full_refresh_reprocesses(spark, tmp_path):
    root = str(tmp_path / "lake")
    raw = str(tmp_path / "raw" / "orders")
    _write_csv(raw, "batch1.csv", BATCH1)
    pipe = _build_pipeline(root, raw)
    stream = lambda: {"raw_orders": read_csv_stream(spark, raw, ORDER_SCHEMA)}  # noqa: E731
    pipe.run(spark, external_inputs=stream())
    # full refresh: same file count afterwards (reprocessed, not doubled)
    result = pipe.run(spark, full_refresh=True, external_inputs=stream())
    assert spark.read.parquet(result.written["bronze_orders"]).count() == 5


def test_event_log_records_per_node_outcomes(spark, tmp_path):
    """The pipeline event log (reference-platform event-log analogue)
    records one row per node with status, duration and expectation
    metrics — including the failed FAIL-gate node."""
    root = str(tmp_path / "lake")
    raw = str(tmp_path / "raw" / "orders")
    _write_csv(raw, "batch1.csv", BATCH1)
    log_path = str(tmp_path / "event_log")

    pipe = _build_pipeline(root, raw)
    external = {"raw_orders": read_csv_stream(spark, raw, ORDER_SCHEMA)}
    result = pipe.run(spark, external_inputs=external, event_log_path=log_path)
    assert [e["status"] for e in result.events] == ["written"] * 3

    log = spark.read.parquet(log_path)
    rows = {r["table"]: r for r in log.collect()}
    assert set(rows) == {"bronze_orders", "silver_orders", "gold_state_orders"}
    assert all(r["status"] == "written" for r in rows.values())
    assert all(r["duration_s"] >= 0 for r in rows.values())
    import json

    silver_metrics = json.loads(rows["silver_orders"]["metrics_json"])
    assert rows["silver_orders"]["layer"] == "silver"
    assert isinstance(silver_metrics, dict)

    # failing FAIL gate logs status=failed before propagating
    bad_gold = TableDef(
        name="gold_bad",
        inputs=("silver_orders",),
        build=lambda ins: ins["silver_orders"]
        .groupBy("customer_state")
        .agg(F.count(F.lit(1)).alias("n")),
        expectations=[expect_or_fail("impossible", F.col("n") < 0)],
        layer="gold",
    )
    pipe2 = Pipeline("failing", Catalog(root=root), [bad_gold])
    silver_df = spark.read.parquet(os.path.join(root, "silver", "silver_orders"))
    with pytest.raises(ExpectationFailed):
        pipe2.run(
            spark,
            external_inputs={"silver_orders": silver_df},
            event_log_path=log_path,
        )
    failed = (
        spark.read.parquet(log_path)
        .filter(F.col("table") == "gold_bad")
        .collect()
    )
    assert len(failed) == 1 and failed[0]["status"] == "failed"


def test_gold_fail_gate_blocks_promotion(spark, tmp_path):
    root = str(tmp_path / "lake")
    raw = str(tmp_path / "raw" / "orders")
    # negative price slips through a silver WITHOUT the price expectation
    _write_csv(raw, "bad.csv", [("a" * 32, "SP", "delivered", "-5.00")])
    catalog = Catalog(root=root)
    bronze = TableDef(
        name="bronze_orders",
        inputs=("raw_orders",),
        build=lambda ins: ins["raw_orders"],
        materialization=Materialization.STREAMING_TABLE,
        layer="bronze",
    )
    gold = TableDef(
        name="gold_state_orders",
        inputs=("bronze_orders",),
        build=lambda ins: ins["bronze_orders"]
        .groupBy("customer_state")
        .agg(F.sum(F.col("price").cast("decimal(10,2)")).alias("total_revenue")),
        expectations=[expect_or_fail("non_negative_revenue", F.col("total_revenue") >= 0)],
        layer="gold",
    )
    pipe = Pipeline("fail_gate", catalog, [bronze, gold])
    with pytest.raises(ExpectationFailed):
        pipe.run(
            spark,
            external_inputs={"raw_orders": read_csv_stream(spark, raw, ORDER_SCHEMA)},
        )
    # gold target was never promoted
    assert not os.path.exists(catalog.path_for("gold_state_orders", "gold"))


def test_rescued_data_column(spark, tmp_path):
    """Malformed rows land in _rescued_data instead of failing the read
    (reference bronze rescuedDataColumn)."""
    raw = str(tmp_path / "raw" / "orders")
    os.makedirs(raw, exist_ok=True)
    with open(os.path.join(raw, "mixed.csv"), "w") as f:
        f.write("order_id,customer_state,order_status,price\n")
        f.write(f"{'a'*32},SP,delivered,10.00\n")
    schema = T.StructType(
        [
            T.StructField("order_id", T.StringType()),
            T.StructField("customer_state", T.StringType()),
            T.StructField("order_status", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    with open(os.path.join(raw, "mixed.csv"), "a") as f:
        f.write(f"{'b'*32},RJ,shipped,NOT_A_NUMBER\n")
    from olist_lakehouse_2_0_spark.sources.batch import read_csv

    df = read_csv(spark, raw, schema)
    rows = df.collect()
    assert len(rows) == 2
    rescued = [r for r in rows if r._rescued_data is not None]
    assert len(rescued) == 1
    assert "NOT_A_NUMBER" in rescued[0]._rescued_data
    assert rescued[0].price is None


def test_cycle_detection(spark, tmp_path):
    catalog = Catalog(root=str(tmp_path))
    a = TableDef(name="a", inputs=("b",), build=lambda i: i["b"])
    b = TableDef(name="b", inputs=("a",), build=lambda i: i["a"])
    with pytest.raises(ValueError, match="cycle"):
        Pipeline("cyclic", catalog, [a, b]).topo_order()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Files written under an evolved schema (added column) read back
    as one table with NULL backfill when merge_schema is on."""
    from olist_lakehouse_2_0_spark.sources.batch import read_parquet

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        p + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(p + "/batch=2")

    df = read_parquet(spark, p, merge_schema=True)
    assert set(df.columns) >= {"id", "name", "score", "batch"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows == {1: None, 2: 9.5}


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Catalog.write(partition_by=...) must produce a layout where a
    partition-key filter prunes at planning time (PartitionFilters in
    the scan, only matching files read)."""
    import contextlib
    import io

    from olist_lakehouse_2_0_spark.catalog import Catalog

    cat = Catalog(root=str(tmp_path))
    df = spark.range(0, 1000).selectExpr(
        "id", "CAST(id % 4 AS INT) AS shard"
    )
    cat.write(df, "sharded", partition_by=["shard"])

    scan = cat.read(spark, "sharded").filter("shard = 2")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "shard" in plan
    assert scan.count() == 250
