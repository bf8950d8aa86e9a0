"""Daily-orchestration mirror (reference resources/olist_jobs.yml:36-112
and SURVEY §3.3): generate synthetic data with injected violations,
land it as CSVs, run the main medallion pipeline (streaming bronze →
DQ silver → gold) AND the CDC pipeline (staging validation → SCD1
apply) over the same generated batch — the whole daily job in one
scenario, every stage produced by the engine itself."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olist_lakehouse_2_0_spark import datagen as G
from olist_lakehouse_2_0_spark.catalog import Catalog
from olist_lakehouse_2_0_spark.operators.cdc import (
    ChangeSpec,
    scd1_snapshot,
    validate_changes,
)
from olist_lakehouse_2_0_spark.operators.expectations import (
    enforce,
    expect_or_drop,
)
from olist_lakehouse_2_0_spark.plans.pipeline import (
    Materialization,
    Pipeline,
    TableDef,
)
from olist_lakehouse_2_0_spark.sources.batch import read_csv
from olist_lakehouse_2_0_spark.streaming.ingest import read_csv_stream

N_ORDERS = 800

ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("order_purchase_timestamp", T.StringType()),
    ]
)

VALID_STATUSES = list(G.ORDER_STATUSES)


def test_daily_job_generate_ingest_transform_and_cdc(spark, tmp_path):
    # --- task 1: generate (reference generate_data task) -------------
    orders = G.gen_orders(spark, N_ORDERS, n_customers=200, bad_rate=0.02)
    raw_orders = str(tmp_path / "raw" / "orders")
    G.write_landing_csv(orders, raw_orders)
    injected_bad = orders.filter(
        F.col("order_status") == "INVALID_STATUS"
    ).count()
    assert injected_bad > 0

    # --- task 2: main pipeline (streaming bronze -> silver -> gold) --
    catalog = Catalog(root=str(tmp_path / "lake"))
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
                "valid_status",
                F.col("order_status").isin([s.lower() for s in VALID_STATUSES]),
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
    pipe = Pipeline("daily_main", catalog, [bronze, silver, gold])
    result = pipe.run(
        spark,
        external_inputs={
            "raw_orders": read_csv_stream(spark, raw_orders, ORDER_SCHEMA)
        },
    )

    silver_df = spark.read.parquet(result.written["silver_orders"])
    # DQ dropped exactly the injected invalid-status rows (generated
    # ids are always 32 chars here, so status is the only violation)
    assert silver_df.count() == N_ORDERS - injected_bad
    gold_df = spark.read.parquet(result.written["gold_status_counts"])
    assert gold_df.agg(F.sum("n_orders")).first()[0] == N_ORDERS - injected_bad
    assert (
        gold_df.filter(F.col("order_status") == "invalid_status").count() == 0
    )

    # --- task 3: CDC pipeline over a generated feed ------------------
    cdc = G.gen_cdc_changes(spark, 300, n_entities=200)
    raw_cdc = str(tmp_path / "raw" / "cdc_customers")
    G.write_landing_csv(cdc, raw_cdc)

    cdc_schema = T.StructType(
        [
            T.StructField("sequence_number", T.LongType()),
            T.StructField("operation", T.StringType()),
            T.StructField("change_timestamp", T.StringType()),
            T.StructField("customer_id", T.StringType()),
            T.StructField("customer_city", T.StringType()),
            T.StructField("customer_state", T.StringType()),
        ]
    )
    spec = ChangeSpec(
        keys=("customer_id",),
        sequence_by=("sequence_number",),
        operation_col="operation",
        except_columns=("change_timestamp",),
    )
    staged = read_csv(spark, raw_cdc, cdc_schema, audit=False).drop(
        "_rescued_data"
    )
    assert staged.count() == 300
    # contract check surfaces zero violations on the generated feed
    assert validate_changes(staged, spec).count() == 0
    snapshot = scd1_snapshot(staged, spec)
    # one current row per surviving key, none for keys whose latest
    # event was a DELETE
    latest = staged.withColumn(
        "_rn",
        F.row_number().over(
            W.partitionBy("customer_id").orderBy(F.desc("sequence_number"))
        ),
    ).filter(F.col("_rn") == 1)
    live_keys = latest.filter(F.col("operation") != "DELETE").count()
    assert snapshot.count() == live_keys
    assert snapshot.select("customer_id").distinct().count() == live_keys
