"""Silver-layer cleanse/normalize/derive column builders.

Column-expression re-implementations of the reference's silver
transforms (reference src/pipelines/silver/customers.sql:29-39,
orders.sql:31-61, products.sql:30-73, order_reviews.sql:41-55). All are
pure ``pyspark.sql.functions`` compositions — JVM-side, codegen'd, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def clean_id(col: Column | str) -> Column:
    """TRIM'd id column (reference silver/orders.sql:31)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(c)


def normalize_city(col: Column | str) -> Column:
    """INITCAP(TRIM(lower)) city normalization (reference
    silver/customers.sql:34, silver/geolocation.sql:18)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.initcap(F.trim(F.lower(c)))


def normalize_state(col: Column | str) -> Column:
    """UPPER(TRIM) state code (reference silver/customers.sql:35)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.trim(c))


def normalize_category(col: Column | str) -> Column:
    """lower + underscores->spaces (reference silver/products.sql:35)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(F.lower(F.trim(c)), F.lit("_"), F.lit(" "))


def sentiment(score: Column | str) -> Column:
    """Review-score sentiment rule (reference
    silver/order_reviews.sql:41-45)."""
    c = F.col(score) if isinstance(score, str) else score
    return (
        F.when(c >= 4, "positive")
        .when(c == 3, "neutral")
        .when(c <= 2, "negative")
        .otherwise(F.lit(None).cast("string"))
    )


def size_category(volume_cm3: Column | str) -> Column:
    """Product size bands (reference silver/products.sql:64-73)."""
    c = F.col(volume_cm3) if isinstance(volume_cm3, str) else volume_cm3
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c < 1000, "small")
        .when(c < 10000, "medium")
        .when(c < 100000, "large")
        .otherwise("extra_large")
    )


def delivery_days(purchase_ts: Column | str, delivered_ts: Column | str) -> Column:
    """DATEDIFF(delivered, purchase) (reference silver/orders.sql:47)."""
    p = F.col(purchase_ts) if isinstance(purchase_ts, str) else purchase_ts
    d = F.col(delivered_ts) if isinstance(delivered_ts, str) else delivered_ts
    return F.datediff(F.to_date(d), F.to_date(p))


def add_processed_at(df: DataFrame) -> DataFrame:
    """Silver audit column (reference silver/orders.sql:61)."""
    return df.withColumn("_processed_at", F.current_timestamp())


def add_refreshed_at(df: DataFrame) -> DataFrame:
    """Gold audit column (reference gold/daily_orders.sql:61)."""
    return df.withColumn("_refreshed_at", F.current_timestamp())
