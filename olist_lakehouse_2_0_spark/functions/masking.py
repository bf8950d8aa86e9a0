"""PII column masks and row filters (governance layer).

Re-implements the reference's SQL mask/row-filter functions
(reference src/setup/pii_masking.sql:22-92) as Column expressions, and
the ``IS_ACCOUNT_GROUP_MEMBER`` platform builtin as a session-config
lookup (``engine.user.groups`` — comma-separated group names).

Mask semantics (reference pii_masking.sql:27-69, NULL passthrough):
- name  -> first char + '*** ' + last whitespace-separated word
- email -> first 2 chars + '****@' + domain
- phone -> first 10 chars + '****-****'

Row-filter semantics (reference pii_masking.sql:83-91): admin /
pii-readers see all rows; region groups see their states; everyone
else defaults TRUE (all rows, but masked columns).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

PRIVILEGED_GROUPS = ("admin", "pii-readers")


def session_groups(spark: SparkSession) -> set[str]:
    raw = spark.conf.get("engine.user.groups", "")
    return {g.strip() for g in (raw or "").split(",") if g.strip()}


def is_group_member(spark: SparkSession, group: str) -> bool:
    """OSS stand-in for IS_ACCOUNT_GROUP_MEMBER (reference
    pii_masking.sql:25-26)."""
    return group in session_groups(spark)


def mask_name(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    masked = F.concat(
        F.substring(c, 1, 1), F.lit("*** "), F.substring_index(c, " ", -1)
    )
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(masked)


def mask_email(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    masked = F.concat(
        F.substring(c, 1, 2), F.lit("****@"), F.substring_index(c, "@", -1)
    )
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(masked)


def mask_phone(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    masked = F.concat(F.substring(c, 1, 10), F.lit("****-****"))
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(masked)


#: SQL bodies of the masks — same expressions as the Column functions
#: above, usable as catalog-registered SQL UDFs.
_SQL_MASKS = {
    "mask_name": (
        "CASE WHEN s IS NULL THEN NULL ELSE CONCAT(SUBSTRING(s, 1, 1), "
        "'*** ', SUBSTRING_INDEX(s, ' ', -1)) END"
    ),
    "mask_email": (
        "CASE WHEN s IS NULL THEN NULL ELSE CONCAT(SUBSTRING(s, 1, 2), "
        "'****@', SUBSTRING_INDEX(s, '@', -1)) END"
    ),
    "mask_phone": (
        "CASE WHEN s IS NULL THEN NULL ELSE CONCAT(SUBSTRING(s, 1, 10), "
        "'****-****') END"
    ),
}


def register_sql_masks(spark: SparkSession) -> list[str]:
    """Register the masks as SQL UDFs (``CREATE OR REPLACE TEMPORARY
    FUNCTION ... RETURN <expr>``) — the direct analogue of the
    reference's CREATE FUNCTION masks (reference
    src/setup/pii_masking.sql:22-70). SQL UDFs inline as Catalyst
    expressions at plan time: no serialization boundary, same codegen
    as the Column-expression forms, and callable from any
    ``spark.sql`` query. Returns the registered names."""
    for name, body in _SQL_MASKS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(s STRING) "
            f"RETURNS STRING RETURN {body}"
        )
    return list(_SQL_MASKS)
