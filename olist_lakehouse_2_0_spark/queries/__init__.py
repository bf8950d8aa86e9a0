"""Query registry: the driver contract's queries() / oracle_sql() source.

Submodules contribute (name -> callable) and (name -> DuckDB SQL) dicts;
this module merges them. Queries without an oracle entry are checked
rows-only by the driver (non-SQL-expressible operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from olist_lakehouse_2_0_spark.queries.analytics import (
    ANALYTICS_ORACLES,
    ANALYTICS_QUERIES,
)
from olist_lakehouse_2_0_spark.queries.cdc_queries import (
    CDC_ORACLES,
    CDC_QUERIES,
)
from olist_lakehouse_2_0_spark.queries.event_queries import (
    EVENT_ORACLES,
    EVENT_QUERIES,
)
from olist_lakehouse_2_0_spark.queries.join_grouping import (
    JOIN_GROUPING_ORACLES,
    JOIN_GROUPING_QUERIES,
)
from olist_lakehouse_2_0_spark.queries.governance_queries import (
    GOVERNANCE_ORACLES,
    GOVERNANCE_QUERIES,
)
from olist_lakehouse_2_0_spark.queries.llm_queries import (
    LLM_ORACLES,
    LLM_QUERIES,
)
from olist_lakehouse_2_0_spark.queries.relational import (
    RELATIONAL_ORACLES,
    RELATIONAL_QUERIES,
)
from olist_lakehouse_2_0_spark.queries.window_analytics import (
    WINDOW_ANALYTICS_ORACLES,
    WINDOW_ANALYTICS_QUERIES,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    queries: dict[str, QueryFn] = {}
    queries.update(RELATIONAL_QUERIES)
    queries.update(ANALYTICS_QUERIES)
    queries.update(WINDOW_ANALYTICS_QUERIES)
    queries.update(JOIN_GROUPING_QUERIES)
    queries.update(GOVERNANCE_QUERIES)
    queries.update(CDC_QUERIES)
    queries.update(LLM_QUERIES)
    queries.update(EVENT_QUERIES)
    return queries


def all_oracles() -> dict[str, str]:
    oracles: dict[str, str] = {}
    oracles.update(RELATIONAL_ORACLES)
    oracles.update(ANALYTICS_ORACLES)
    oracles.update(WINDOW_ANALYTICS_ORACLES)
    oracles.update(JOIN_GROUPING_ORACLES)
    oracles.update(GOVERNANCE_ORACLES)
    oracles.update(CDC_ORACLES)
    oracles.update(LLM_ORACLES)
    oracles.update(EVENT_ORACLES)
    return oracles
