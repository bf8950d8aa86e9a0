"""run.py — the daily/weekly orchestration CLI (SURVEY §3.3; VERDICT r4
next-step #4): one command reproduces the reference's scheduled job on
a temp warehouse. Covers: incremental daily run (generate -> main ||
cdc in parallel threads), a second incremental run picking up ONLY the
new landing batch through the streaming checkpoint, and the weekly
full refresh (checkpoint delete + truncate) reconverging on the same
totals; the event log accumulates rows from both pipelines."""

from __future__ import annotations

from pyspark.sql import functions as F

import run as runner


def _gold_total(spark, path: str) -> int:
    return (
        spark.read.parquet(path).agg(F.sum("n_orders")).first()[0]
    )


def test_daily_then_incremental_then_weekly_full_refresh(spark, tmp_path):
    wh = str(tmp_path / "wh")
    n = 200

    s1 = runner.run_job(spark, wh, "daily", n_orders=n, n_cdc=100)
    assert set(s1["written"]) == {
        "bronze_orders",
        "silver_orders",
        "gold_status_counts",
        "customers_scd1",
    }
    total1 = _gold_total(spark, s1["written"]["gold_status_counts"])
    # The generator injects ~2% bad statuses; DQ drops them in silver.
    assert 0 < total1 < n

    # Second daily run: a new landing batch appends; the streaming
    # checkpoint ingests only the unseen files, so totals double
    # (gen_orders is deterministic — each batch is identical, so the
    # DQ drop count per batch is too).
    s2 = runner.run_job(spark, wh, "daily", n_orders=n, n_cdc=100)
    total2 = _gold_total(spark, s2["written"]["gold_status_counts"])
    assert total2 == 2 * total1

    # Weekly full refresh: generates a third batch, deletes checkpoints
    # and truncates targets, reprocesses ALL batches sequentially.
    s3 = runner.run_job(spark, wh, "weekly", n_orders=n, n_cdc=100)
    total3 = _gold_total(spark, s3["written"]["gold_status_counts"])
    assert total3 == 3 * total1

    # Event log accumulated rows from the main pipeline AND the CDC
    # task across all three runs, in the shared schema.
    log = spark.read.parquet(s3["event_log"])
    assert {"pipeline", "table", "status", "duration_s"} <= set(log.columns)
    assert log.filter(F.col("pipeline") == "daily_main").count() >= 9
    assert log.filter(F.col("pipeline") == "daily_cdc").count() == 3

    # SCD1 snapshot: one current row per surviving key.
    scd1 = spark.read.parquet(s3["written"]["customers_scd1"])
    assert scd1.count() == scd1.select("customer_id").distinct().count()


def test_cli_argparse_path(spark, tmp_path):
    summary = runner.main(
        [
            "--warehouse",
            str(tmp_path / "wh2"),
            "--orders",
            "60",
            "--cdc-events",
            "40",
        ]
    )
    assert summary["mode"] == "daily"
    assert "gold_status_counts" in summary["written"]


def test_export_delta_publishes_serving_tables(spark, tmp_path):
    """--export-delta: each run publishes the gold MV and the SCD1
    snapshot as one more Delta commit; the Delta read must equal the
    lake table exactly, and the second run's republish must land as
    version 1 with version 0 still time-travelable."""
    from olist_lakehouse_2_0_spark.delta_export import read_delta

    wh = str(tmp_path / "wh_delta")
    ddir = str(tmp_path / "delta_out")
    s1 = runner.run_job(
        spark, wh, "daily", n_orders=80, n_cdc=60, export_delta_dir=ddir
    )
    assert s1["delta_published"] == {
        "gold_status_counts": 0, "customers_scd1": 0,
    }
    for node in ("gold_status_counts", "customers_scd1"):
        lake = spark.read.parquet(s1["written"][node])
        delta = read_delta(spark, f"{ddir}/{node}")
        assert sorted(map(tuple, lake.collect())) == sorted(
            map(tuple, delta.collect())
        )
    # second incremental run: gold doubles; republish = Delta version 1
    s2 = runner.run_job(
        spark, wh, "daily", n_orders=80, n_cdc=60, export_delta_dir=ddir
    )
    assert s2["delta_published"]["gold_status_counts"] == 1
    gold_now = read_delta(spark, f"{ddir}/gold_status_counts")
    gold_v0 = read_delta(spark, f"{ddir}/gold_status_counts", version=0)
    n_now = gold_now.agg(F.sum("n_orders")).first()[0]
    n_v0 = gold_v0.agg(F.sum("n_orders")).first()[0]
    assert n_now == 2 * n_v0
