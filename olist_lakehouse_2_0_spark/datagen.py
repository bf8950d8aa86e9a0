"""Distributed synthetic Olist-shaped data generation with controlled
bad-data injection — the engine counterpart of the reference's
data generator (reference src/utils/data_generator.py:35-42,294-360 and
tests/unit/test_data_generator.py:294-360), re-designed Spark-first:

- The reference builds rows in driver-side Python loops; here every
  entity is ``spark.range(n)`` + deterministic column expressions
  (xxhash64-derived), so generation is distributed, O(1) driver memory,
  and reproducible at any scale — 1e3 or 1e10 rows is the same plan.
- No RNG: every value is a pure function of (row id, seed), so reruns,
  retries and engine ports produce byte-identical data.
- Bad-data injection at a configurable rate (~2% like the reference)
  with the reference's per-entity violation classes: null/short ids,
  invalid order status, negative price/freight, invalid payment type,
  out-of-range review score. The injected rows are exactly the ones the
  silver DQ expectations must catch (DROP ROW policy).
- CDC feeds: (sequence_number BIGINT, operation, change_timestamp,
  payload) with monotonically increasing sequence and a ~60/30/10
  INSERT/UPDATE/DELETE mix (reference docs/CDC_GUIDE.md:26-42,
  tests/unit/test_data_generator.py:161-188).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

STATES = (
    "SP", "RJ", "MG", "RS", "PR", "SC", "BA", "DF", "GO", "PE", "CE",
)
ORDER_STATUSES = ("delivered", "shipped", "processing", "canceled", "invoiced")
PAYMENT_TYPES = ("credit_card", "boleto", "voucher", "debit_card")
CATEGORIES = (
    "informatica_acessorios", "cama_mesa_banho", "beleza_saude",
    "moveis_decoracao", "esporte_lazer",
)
_BASE_TS = "2017-01-01 00:00:00"


def _h(salt: str) -> Column:
    """Deterministic 63-bit hash of the row id under a salt."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(salt)))


def _pick(options: tuple[str, ...], salt: str) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(_h(salt), F.lit(len(options))) + 1).cast("int"))


def _id32(prefix: str) -> Column:
    """32-char hex entity id (the silver layer enforces LENGTH = 32)."""
    return F.md5(F.concat(F.lit(prefix), F.col("id").cast("string")))


def _fk32(prefix: str, parent_n: int, salt: str) -> Column:
    """Foreign key to a parent entity: same id formula over a hashed
    parent index, so referential integrity holds without any join —
    for parents whose OWN id wasn't corrupted by injection. A parent
    hit by bad-id injection orphans its children (deliberately: that
    is exactly what corrupt upstream ids do in production, and the DQ
    pipeline drops the bad parent while the orphaned children surface
    in join-miss metrics)."""
    idx = F.pmod(_h(salt), F.lit(parent_n)).cast("string")
    return F.md5(F.concat(F.lit(prefix), idx))


def _is_bad(bad_rate: float, salt: str) -> Column:
    return F.pmod(_h(salt), F.lit(10_000)) < int(bad_rate * 10_000)


def _ts_iso(salt: str, span_days: int = 365) -> Column:
    """ISO-8601 timestamp string (silver exercises TO_TIMESTAMP)."""
    secs = F.pmod(_h(salt), F.lit(span_days * 86_400))
    return F.date_format(
        F.to_timestamp(F.lit(_BASE_TS)) + F.make_dt_interval(secs=secs),
        "yyyy-MM-dd HH:mm:ss",
    )


def gen_customers(spark: SparkSession, n: int, bad_rate: float = 0.02) -> DataFrame:
    base = spark.range(n)
    good_id = _id32("cust")
    return base.select(
        # bad class: short (8-char) id — violates the 32-char constraint
        F.when(_is_bad(bad_rate, "c_bad"), F.substring(good_id, 1, 8))
        .otherwise(good_id)
        .alias("customer_id"),
        (F.pmod(_h("c_zip"), F.lit(99_000)) + 1000).cast("int").alias(
            "customer_zip_code_prefix"
        ),
        F.initcap(
            F.concat(F.lit("cidade "), F.pmod(_h("c_city"), F.lit(200)).cast("string"))
        ).alias("customer_city"),
        _pick(STATES, "c_state").alias("customer_state"),
    )


def gen_orders(
    spark: SparkSession, n: int, n_customers: int, bad_rate: float = 0.02
) -> DataFrame:
    base = spark.range(n)
    return base.select(
        _id32("order").alias("order_id"),
        _fk32("cust", n_customers, "o_cust").alias("customer_id"),
        # bad class: invalid status
        F.when(_is_bad(bad_rate, "o_bad"), F.lit("INVALID_STATUS"))
        .otherwise(_pick(ORDER_STATUSES, "o_status"))
        .alias("order_status"),
        _ts_iso("o_ts").alias("order_purchase_timestamp"),
    )


def gen_order_items(
    spark: SparkSession,
    n: int,
    n_orders: int,
    n_products: int,
    n_sellers: int,
    bad_rate: float = 0.02,
) -> DataFrame:
    base = spark.range(n)
    price = (F.pmod(_h("i_price"), F.lit(49_900)) + 100) / 100.0
    freight = F.pmod(_h("i_freight"), F.lit(5_000)) / 100.0
    return base.select(
        _fk32("order", n_orders, "i_order").alias("order_id"),
        (F.pmod(_h("i_seq"), F.lit(5)) + 1).cast("int").alias("order_item_id"),
        _fk32("prod", n_products, "i_prod").alias("product_id"),
        _fk32("sell", n_sellers, "i_sell").alias("seller_id"),
        # bad class: negative price
        F.when(_is_bad(bad_rate, "i_bad"), -price).otherwise(price).alias("price"),
        F.round(freight, 2).alias("freight_value"),
    )


def gen_payments(
    spark: SparkSession, n: int, n_orders: int, bad_rate: float = 0.02
) -> DataFrame:
    base = spark.range(n)
    return base.select(
        _fk32("order", n_orders, "p_order").alias("order_id"),
        (F.pmod(_h("p_seq"), F.lit(3)) + 1).cast("int").alias("payment_sequential"),
        # bad class: invalid payment type
        F.when(_is_bad(bad_rate, "p_bad"), F.lit("bitcoin"))
        .otherwise(_pick(PAYMENT_TYPES, "p_type"))
        .alias("payment_type"),
        (F.pmod(_h("p_inst"), F.lit(12)) + 1).cast("int").alias(
            "payment_installments"
        ),
        (F.round(F.pmod(_h("p_val"), F.lit(100_000)) / 100.0, 2)).alias(
            "payment_value"
        ),
    )


def gen_reviews(
    spark: SparkSession, n: int, n_orders: int, bad_rate: float = 0.02
) -> DataFrame:
    base = spark.range(n)
    score = (F.pmod(_h("r_score"), F.lit(5)) + 1).cast("int")
    return base.select(
        _id32("review").alias("review_id"),
        _fk32("order", n_orders, "r_order").alias("order_id"),
        # bad class: out-of-range score
        F.when(_is_bad(bad_rate, "r_bad"), F.lit(11)).otherwise(score).alias(
            "review_score"
        ),
        _ts_iso("r_ts").alias("review_creation_date"),
    )


def gen_cdc_changes(
    spark: SparkSession,
    n: int,
    n_entities: int,
    key_prefix: str = "cust",
    start_sequence: int = 1,
) -> DataFrame:
    """One CDC batch: monotonically increasing sequence numbers (the
    row id itself — unique, sortable, gap-free) and a ~60/30/10
    INSERT/UPDATE/DELETE mix."""
    base = spark.range(n)
    bucket = F.pmod(_h("cdc_op"), F.lit(10))
    op = (
        F.when(bucket < 6, "INSERT").when(bucket < 9, "UPDATE").otherwise("DELETE")
    )
    return base.select(
        (F.col("id") + start_sequence).alias("sequence_number"),
        op.alias("operation"),
        _ts_iso("cdc_ts", span_days=30).alias("change_timestamp"),
        _fk32(key_prefix, n_entities, "cdc_key").alias("customer_id"),
        F.initcap(
            F.concat(F.lit("cidade "), F.pmod(_h("cdc_city"), F.lit(200)).cast("string"))
        ).alias("customer_city"),
        _pick(STATES, "cdc_state").alias("customer_state"),
    )


def write_landing_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Land an entity as a CSV directory — the bronze ingestion input
    (reference S7 writer shape: header, overwrite). ``mode="append"``
    lands an additional batch as new files in the same directory — the
    daily-job incremental shape, where the streaming checkpoint picks
    up only the unseen files (run.py)."""
    df.write.mode(mode).option("header", "true").csv(path)
