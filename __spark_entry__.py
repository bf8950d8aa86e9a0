"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke);
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
named (spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` provides
the DuckDB-equivalent SQL for hash comparison at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from olist_lakehouse_2_0_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from olist_lakehouse_2_0_spark.queries.relational import daily_orders

    return daily_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query — every registered query has one
    (the registry carries no rows-only entries as of round 4)."""
    return all_oracles()
