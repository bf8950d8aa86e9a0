"""Daily/weekly orchestration entry point (SURVEY §3.3; reference
resources/olist_jobs.yml:36-160): one command reproduces the
reference's scheduled job on a local warehouse —

    generate synthetic landing CSVs
      -> run the main medallion pipeline (streaming bronze -> DQ
         silver -> gold)  ||  run the CDC pipeline (staging
         validation -> SCD1 apply)

The two pipeline tasks depend only on generate and run IN PARALLEL
(reference olist_jobs.yml:87-112) — two driver threads sharing one
SparkSession, which is exactly how Databricks runs parallel tasks of
a job on one cluster: Spark schedules concurrent jobs from multiple
threads safely. The weekly variant (reference olist_jobs.yml:117-160)
runs FULL REFRESH sequentially: streaming checkpoints deleted +
targets truncated (plans/pipeline.full_refresh_reset) before
recomputing.

Usage::

    python run.py --warehouse /tmp/olist_daily                 # daily
    python run.py --warehouse /tmp/olist_daily --mode weekly   # full refresh
    python run.py --warehouse W --orders 2000 --cdc-events 600

Every node appends an audit row to ``<warehouse>/_event_log`` (the
engine's pipeline event log — queried by ``pipeline_event_log_audit``),
and the command prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from olist_lakehouse_2_0_spark import datagen as G  # noqa: E402
from olist_lakehouse_2_0_spark import get_spark  # noqa: E402
from olist_lakehouse_2_0_spark.catalog import Catalog  # noqa: E402
from olist_lakehouse_2_0_spark.operators.cdc import (  # noqa: E402
    ChangeSpec,
    scd1_snapshot,
    validate_changes,
)
from olist_lakehouse_2_0_spark.operators.expectations import (  # noqa: E402
    expect_or_drop,
)
from olist_lakehouse_2_0_spark.plans.pipeline import (  # noqa: E402
    EVENT_LOG_LOCK,
    Materialization,
    Pipeline,
    TableDef,
)
from olist_lakehouse_2_0_spark.streaming.ingest import (  # noqa: E402
    read_csv_stream,
)

ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("order_purchase_timestamp", T.StringType()),
    ]
)

CDC_SCHEMA = T.StructType(
    [
        T.StructField("sequence_number", T.LongType()),
        T.StructField("operation", T.StringType()),
        T.StructField("change_timestamp", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("customer_city", T.StringType()),
        T.StructField("customer_state", T.StringType()),
    ]
)

CDC_SPEC = ChangeSpec(
    keys=("customer_id",),
    sequence_by=("sequence_number",),
    operation_col="operation",
    except_columns=("change_timestamp",),
)


def generate(
    spark: SparkSession, warehouse: str, n_orders: int, n_cdc: int
) -> tuple[str, str]:
    """Task 1 (reference olist_jobs.yml:68-77): land synthetic CSVs —
    orders with ~2% injected DQ violations, plus a CDC change feed.
    Appends a new batch per invocation (incremental runs pick up only
    the new files via the streaming checkpoint)."""
    raw_orders = os.path.join(warehouse, "raw", "orders")
    raw_cdc = os.path.join(warehouse, "raw", "cdc_customers")
    orders = G.gen_orders(spark, n_orders, n_customers=max(2, n_orders // 4),
                          bad_rate=0.02)
    G.write_landing_csv(orders, raw_orders, mode="append")
    # Each appended CDC batch continues the sequence where the feed
    # left off — duplicate (key, sequence) pairs across batches would
    # (correctly) trip validate_changes' contract gate.
    start_seq = 1
    if os.path.isdir(raw_cdc):
        prev_max = (
            spark.read.csv(raw_cdc, schema=CDC_SCHEMA, header=True)
            .agg(F.max("sequence_number"))
            .first()[0]
        )
        start_seq = (prev_max or 0) + 1
    cdc = G.gen_cdc_changes(
        spark, n_cdc, n_entities=max(2, n_cdc // 2), start_sequence=start_seq
    )
    G.write_landing_csv(cdc, raw_cdc, mode="append")
    return raw_orders, raw_cdc


def main_pipeline(catalog: Catalog) -> Pipeline:
    """The medallion DAG (streaming bronze -> DROP-policy silver ->
    gold MV), mirroring the composition proven end-to-end in
    tests/test_daily_job.py."""
    valid_statuses = [s.lower() for s in G.ORDER_STATUSES]
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
            F.trim("customer_id").alias("customer_id"),
            F.lower(F.trim("order_status")).alias("order_status"),
            F.to_timestamp("order_purchase_timestamp").alias(
                "order_purchase_ts"
            ),
        ),
        expectations=[
            expect_or_drop("valid_order_id", F.length("order_id") == 32),
            expect_or_drop(
                "valid_status", F.col("order_status").isin(valid_statuses)
            ),
        ],
        materialization=Materialization.STREAMING_TABLE,
        layer="silver",
    )
    gold = TableDef(
        name="gold_status_counts",
        inputs=("silver_orders",),
        build=lambda ins: ins["silver_orders"]
        .groupBy("order_status")
        .agg(F.count(F.lit(1)).alias("n_orders")),
        layer="gold",
    )
    return Pipeline("daily_main", catalog, [bronze, silver, gold])


def run_main(
    spark: SparkSession,
    catalog: Catalog,
    raw_orders: str,
    full_refresh: bool,
    event_log: str,
) -> dict[str, str]:
    result = main_pipeline(catalog).run(
        spark,
        external_inputs={
            "raw_orders": read_csv_stream(spark, raw_orders, ORDER_SCHEMA)
        },
        full_refresh=full_refresh,
        event_log_path=event_log,
    )
    return result.written


def run_cdc(
    spark: SparkSession, catalog: Catalog, raw_cdc: str, event_log: str
) -> dict[str, str]:
    """CDC pipeline task: read the staged change feed, gate it on the
    change-contract validation (FAIL semantics: any malformed change
    aborts the apply), apply SCD1, publish the snapshot. The snapshot
    is a full recompute over the accumulated feed — deterministic
    regardless of how many generate batches have landed — so the
    'incremental' daily run and the weekly full refresh converge."""
    t0 = time.perf_counter()
    staged = spark.read.csv(raw_cdc, schema=CDC_SCHEMA, header=True)
    n_staged = staged.count()
    violations = validate_changes(staged, CDC_SPEC).count()
    if violations:
        raise ValueError(
            f"cdc change feed failed contract validation: {violations} rows"
        )
    snapshot = scd1_snapshot(staged, CDC_SPEC)
    path = catalog.write(snapshot, "customers_scd1", layer="silver")
    # Same row shape as Pipeline.run's log_event, so one event log
    # serves both tasks (and pipeline_event_log_audit's reader).
    _row_df = spark.createDataFrame(
        [(
            "daily_cdc", "customers_scd1", "silver", "materialized_view",
            "written", float(round(time.perf_counter() - t0, 3)),
            json.dumps({"validated_rows": n_staged}),
        )],
        "pipeline string, table string, layer string, "
        "materialization string, status string, duration_s double, "
        "metrics_json string",
    ).withColumn("logged_at", F.current_timestamp())
    # Same lock as Pipeline.run's log_event: the daily mode runs this
    # task in parallel with the main pipeline, and concurrent parquet
    # appends to one directory race on its shared _temporary dir.
    with EVENT_LOG_LOCK:
        _row_df.write.mode("append").parquet(event_log)
    return {"customers_scd1": path}


#: Serving-layer tables the job publishes to Delta when asked — the
#: gold MV and the SCD1 snapshot, i.e. what a Databricks deployment of
#: the reference would hand to downstream Delta consumers.
_DELTA_PUBLISH_NODES = ("gold_status_counts", "customers_scd1")


def run_job(
    spark: SparkSession,
    warehouse: str,
    mode: str = "daily",
    n_orders: int = 800,
    n_cdc: int = 300,
    export_delta_dir: str | None = None,
) -> dict:
    """The whole job: generate, then main || cdc (daily) or full-refresh
    main -> cdc sequentially (weekly, reference olist_jobs.yml:117-160).

    ``export_delta_dir`` additionally publishes the serving tables as
    Delta-protocol tables under that directory after the run (one
    overwrite-shaped commit per run, `delta_export.publish_delta`) —
    the interop hand-off the reference gets for free from Databricks."""
    catalog = Catalog(root=os.path.join(warehouse, "lake"))
    event_log = os.path.join(warehouse, "_event_log")
    raw_orders, raw_cdc = generate(spark, warehouse, n_orders, n_cdc)
    full_refresh = mode == "weekly"
    if full_refresh:
        written = run_main(spark, catalog, raw_orders, True, event_log)
        written.update(run_cdc(spark, catalog, raw_cdc, event_log))
    else:
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_main = pool.submit(
                run_main, spark, catalog, raw_orders, False, event_log
            )
            f_cdc = pool.submit(run_cdc, spark, catalog, raw_cdc, event_log)
            written = f_main.result()
            written.update(f_cdc.result())
    summary = {
        "mode": mode,
        "warehouse": warehouse,
        "written": written,
        "event_log": event_log,
    }
    if export_delta_dir:
        from olist_lakehouse_2_0_spark.delta_export import publish_delta

        summary["delta_published"] = {
            node: publish_delta(
                spark, written[node], os.path.join(export_delta_dir, node)
            )
            for node in _DELTA_PUBLISH_NODES
            if node in written
        }
    return summary


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--warehouse", required=True,
                    help="job root: raw landing zone + lake + event log")
    ap.add_argument("--mode", choices=("daily", "weekly"), default="daily",
                    help="daily = incremental, main||cdc in parallel; "
                         "weekly = full refresh, sequential")
    ap.add_argument("--orders", type=int, default=800)
    ap.add_argument("--cdc-events", type=int, default=300)
    ap.add_argument("--export-delta", metavar="DIR", default=None,
                    help="also publish the serving tables as "
                         "Delta-protocol tables under DIR")
    args = ap.parse_args(argv)
    spark = get_spark(app_name="olist-daily-job")
    summary = run_job(
        spark, args.warehouse, args.mode, args.orders, args.cdc_events,
        export_delta_dir=args.export_delta,
    )
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
