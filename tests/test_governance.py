"""Governance layer: mask semantics + row filters keyed on session groups
(reference pii_masking.sql / apply_masks.sql behaviors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.functions.masking import (
    mask_email,
    mask_name,
    mask_phone,
)
from olist_lakehouse_2_0_spark.governance import (
    ColumnMask,
    ProtectedTable,
    RegionRowFilter,
)


@pytest.fixture()
def customers(spark):
    rows = [
        ("Joao Silva", "joao.silva@gmail.com", "+55 (11) 91234-5678", "SP"),
        ("Maria Santos", "maria@uol.com.br", "+55 (21) 99876-5432", "RJ"),
        ("Pedro Costa", "pedro.costa@hotmail.com", "+55 (51) 98765-4321", "RS"),
        (None, None, None, "BA"),
    ]
    return spark.createDataFrame(
        rows, "customer_name string, customer_email string, customer_phone string, customer_state string"
    )


PROTECTED = ProtectedTable(
    masks=[
        ColumnMask("customer_name", mask_name),
        ColumnMask("customer_email", mask_email),
        ColumnMask("customer_phone", mask_phone),
    ],
    row_filter=RegionRowFilter("customer_state"),
)


def set_groups(spark, groups: str):
    spark.conf.set("engine.user.groups", groups)


def test_mask_semantics(spark, customers):
    set_groups(spark, "")
    out = PROTECTED.read(spark, customers).collect()
    by_state = {r.customer_state: r for r in out}
    assert by_state["SP"].customer_name == "J*** Silva"
    assert by_state["SP"].customer_email == "jo****@gmail.com"
    assert by_state["SP"].customer_phone == "+55 (11) 9****-****"
    # NULL passthrough (reference pii_masking.sql:27)
    assert by_state["BA"].customer_name is None


def test_sql_udf_masks_match_column_expressions(spark, customers):
    """The SQL-UDF registrations (reference CREATE FUNCTION analogue)
    must produce byte-identical output to the Column-expression masks
    — one semantics, two calling surfaces."""
    from olist_lakehouse_2_0_spark.functions.masking import register_sql_masks

    names = register_sql_masks(spark)
    assert set(names) == {"mask_name", "mask_email", "mask_phone"}
    customers.createOrReplaceTempView("gov_customers")
    via_sql = spark.sql(
        "SELECT mask_name(customer_name) AS n, mask_email(customer_email)"
        " AS e, mask_phone(customer_phone) AS p FROM gov_customers"
    )
    via_cols = customers.select(
        mask_name("customer_name").alias("n"),
        mask_email("customer_email").alias("e"),
        mask_phone("customer_phone").alias("p"),
    )
    def rows(df):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple((x is None, x or "") for x in t),
        )

    assert rows(via_sql) == rows(via_cols)


def test_privileged_group_sees_raw(spark, customers):
    set_groups(spark, "pii-readers")
    out = PROTECTED.read(spark, customers).collect()
    assert {r.customer_name for r in out} == {
        "Joao Silva", "Maria Santos", "Pedro Costa", None
    }


def test_region_row_filter(spark, customers):
    set_groups(spark, "region-southeast")
    out = PROTECTED.read(spark, customers).collect()
    assert {r.customer_state for r in out} == {"SP", "RJ"}
    # masked too (not in pii-readers)
    assert all(r.customer_name is None or "***" in r.customer_name for r in out)


def test_default_true_row_filter(spark, customers):
    set_groups(spark, "analysts")  # unknown group: all rows, masked
    out = PROTECTED.read(spark, customers)
    assert out.count() == 4


def test_admin_sees_all_rows_raw(spark, customers):
    set_groups(spark, "admin")
    out = PROTECTED.read(spark, customers)
    assert out.count() == 4
    assert out.filter(F.col("customer_name") == "Joao Silva").count() == 1
