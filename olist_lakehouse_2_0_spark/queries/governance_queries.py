"""Governance query shapes for the driver contract: PII masks applied at
read time (G1-G4, reference src/setup/pii_masking.sql:22-92).

The testdata has no email/phone columns, so the query synthesizes them
deterministically from c_name, then applies the reference's three mask
functions — identical expressions on the DuckDB side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.catalog import load
from olist_lakehouse_2_0_spark.functions.masking import (
    mask_email,
    mask_name,
    mask_phone,
)


def pii_masked_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    email = F.concat(F.lower(F.col("c_name")), F.lit("@example.com"))
    phone = F.concat(F.lit("+55 (11) 9"), F.lpad(F.col("c_custkey") % 10000, 4, "0"),
                     F.lit("-"), F.lpad(F.col("c_custkey") % 10000, 4, "0"))
    return customer.select(
        F.col("c_custkey").alias("customer_id"),
        mask_name(F.col("c_name")).alias("masked_name"),
        mask_email(email).alias("masked_email"),
        mask_phone(phone).alias("masked_phone"),
        F.col("c_mktsegment").alias("segment"),
    )


PII_MASKED_CUSTOMERS_SQL = """
WITH base AS (
  SELECT c_custkey, c_name, c_mktsegment,
         LOWER(c_name) || '@example.com' AS email,
         '+55 (11) 9' || LPAD(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
           || '-' || LPAD(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS phone
  FROM customer
)
SELECT c_custkey AS customer_id,
       CASE WHEN c_name IS NULL THEN NULL
            ELSE SUBSTRING(c_name, 1, 1) || '*** ' || STRING_SPLIT(c_name, ' ')[-1]
       END AS masked_name,
       CASE WHEN email IS NULL THEN NULL
            ELSE SUBSTRING(email, 1, 2) || '****@' || STRING_SPLIT(email, '@')[-1]
       END AS masked_email,
       CASE WHEN phone IS NULL THEN NULL
            ELSE SUBSTRING(phone, 1, 10) || '****-****'
       END AS masked_phone,
       c_mktsegment AS segment
FROM base
"""


def region_filtered_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row filter + column mask applied together through the
    ProtectedTable reader (G1+G2, reference apply_masks.sql:24-41):
    a session holding only ``region-americas`` sees AMERICA-nation rows
    with names masked. The filter predicate is a plain Column, so it
    pushes down to the scan."""
    from olist_lakehouse_2_0_spark.governance import (
        ColumnMask,
        ProtectedTable,
        RegionRowFilter,
    )

    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == F.col("n_nationkey")
    )
    protected = ProtectedTable(
        masks=[ColumnMask("c_name", mask_name)],
        row_filter=RegionRowFilter(
            state_column="n_name",
            group_states={
                "region-americas": ("BRAZIL", "ARGENTINA", "PERU", "CANADA", "UNITED STATES")
            },
        ),
    )
    key = "engine.user.groups"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "region-americas")
    try:
        out = protected.read(spark, joined).select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("masked_name"),
            F.col("n_name").alias("nation"),
            F.col("c_acctbal").cast("decimal(12,2)").alias("acctbal"),
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return out


REGION_FILTERED_CUSTOMERS_SQL = """
SELECT c_custkey AS customer_id,
       CASE WHEN c_name IS NULL THEN NULL
            ELSE SUBSTRING(c_name, 1, 1) || '*** ' || STRING_SPLIT(c_name, ' ')[-1]
       END AS masked_name,
       n_name AS nation,
       CAST(c_acctbal AS DECIMAL(12,2)) AS acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE n_name IN ('BRAZIL', 'ARGENTINA', 'PERU', 'CANADA', 'UNITED STATES')
"""


def sql_udf_masked_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-UDF mask surface under the hash gate (reference CREATE
    FUNCTION masks, src/setup/pii_masking.sql:22-70 — previously
    pytest-only): the same three masks, registered as catalog SQL UDFs
    (``CREATE TEMPORARY FUNCTION ... RETURN <expr>``) and applied
    through a plain ``spark.sql`` query over a view, must produce
    exactly what the Column-expression path produces — the oracle is
    the SAME DuckDB SQL that gates ``pii_masked_customers``, so any
    divergence between the two registration surfaces fails the hash.
    SQL UDFs inline as Catalyst expressions at plan time: no
    serialization boundary, same whole-stage codegen."""
    from olist_lakehouse_2_0_spark.functions.masking import register_sql_masks

    register_sql_masks(spark)
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        "q_sqludf_customer"
    )
    return spark.sql(
        """
        WITH base AS (
          SELECT c_custkey, c_name, c_mktsegment,
                 CONCAT(LOWER(c_name), '@example.com') AS email,
                 CONCAT('+55 (11) 9',
                        LPAD(CAST(c_custkey % 10000 AS STRING), 4, '0'),
                        '-',
                        LPAD(CAST(c_custkey % 10000 AS STRING), 4, '0'))
                   AS phone
          FROM q_sqludf_customer
        )
        SELECT c_custkey AS customer_id,
               mask_name(c_name) AS masked_name,
               mask_email(email) AS masked_email,
               mask_phone(phone) AS masked_phone,
               c_mktsegment AS segment
        FROM base
        """
    )


GOVERNANCE_QUERIES = {
    "pii_masked_customers": pii_masked_customers,
    "region_filtered_customers": region_filtered_customers,
    "sql_udf_masked_customers": sql_udf_masked_customers,
}
GOVERNANCE_ORACLES = {
    "pii_masked_customers": PII_MASKED_CUSTOMERS_SQL,
    "region_filtered_customers": REGION_FILTERED_CUSTOMERS_SQL,
    "sql_udf_masked_customers": PII_MASKED_CUSTOMERS_SQL,
}
