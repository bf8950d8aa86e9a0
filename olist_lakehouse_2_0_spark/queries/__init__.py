"""Query registry: the driver contract's queries() / oracle_sql() source.

Submodules contribute (name -> callable) and (name -> DuckDB SQL) dicts;
this module merges them. Queries without an oracle entry are checked
rows-only by the driver (non-SQL-expressible operators).

Driver-stable output canonicalization
-------------------------------------
The driver hash-compares Spark results (``toPandas()``) against DuckDB
results (``.df()``). DuckDB's pandas conversion always yields float64
for DECIMAL and datetime64 for DATE — while Spark's yields ``Decimal``
and ``datetime.date`` objects, which hash differently even when the
values are identical (round-1 root cause: 28 value-identical queries
failed the hash on exactly this). Queries therefore keep *exact decimal
arithmetic internally* (order-independent, overflow-safe at 1000-way
parallelism — see SURVEY §7.4) and this registry casts only the FINAL
output columns to the driver-stable twins: DecimalType -> double,
DateType -> timestamp. Decimal->double is a single correctly-rounded
IEEE conversion of the already-quantized decimal on both engines, so
values stay deterministic; it is NOT float accumulation.

Residual hazard (hit once, at sf0.001, in round 2): when a double
value lands EXACTLY on a decimal-cast tie boundary (....5 at the cast
scale), Spark rounds half-up and DuckDB half-even — a one-ulp hash
mismatch. Queries whose averages are exposed through a decimal cast
accept this measure-zero risk; where a tie actually occurred
(orders_by_state) the average is computed in exact integer units with
explicit half-up rounding instead (the (2a+n) div 2n idiom — use it if
another query ever trips).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def driver_stable(df: DataFrame) -> DataFrame:
    """Cast final output columns to driver-stable types.

    DecimalType -> double and DateType -> timestamp, matching what
    DuckDB's ``.df()`` emits for the oracle side (see module docstring).
    A no-op (no extra projection) when nothing needs casting; Catalyst
    collapses the added projection otherwise.
    """
    cols = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, T.DecimalType):
            cols.append(F.col(f.name).cast("double").alias(f.name))
            changed = True
        elif isinstance(f.dataType, T.DateType):
            cols.append(F.col(f.name).cast("timestamp").alias(f.name))
            changed = True
        else:
            cols.append(F.col(f.name))
    return df.select(*cols) if changed else df


def _stabilized(fn: QueryFn) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return driver_stable(fn(spark, sf_dir))

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


#: Queries that received a correctness row in round 1 (the driver's
#: file window is ~50 entries in registration order; these 50 were
#: checked, the rest never got a row).
_R1_CHECKED = {
    "daily_orders", "monthly_orders_lag", "orders_by_state",
    "orders_enriched", "seller_performance", "category_performance_lag",
    "geo_dedup", "silver_cleanse", "top_parts_per_brand",
    "valid_orders_filter", "dq_violation_summary", "top_revenue_orders",
    "pricing_summary", "revenue_by_nation", "orders_building_segment_semi",
    "customers_inactive_anti", "orders_rollup", "returnflag_pivot",
    "price_percentiles", "priority_metrics_unpivot", "orders_rollup_flags",
    "nation_revenue_share", "discounted_revenue_disjunctive",
    "daily_revenue_trend", "segment_spend_ranks", "parts_above_brand_avg",
    "daily_orders_gapfill", "daily_channel_full_outer",
    "priority_region_matrix", "orders_cube", "segment_spend_extremes",
    "similar_name_pairs", "customer_order_distribution",
    "first_order_per_customer", "pii_masked_customers",
    "region_filtered_customers", "scd1_users", "scd2_users", "text_stats",
    "doc_chunks", "doc_quality_zscore", "doc_quality_by_source",
    "top_tokens", "exact_dedup_docs", "jaccard_dups", "minhash_dups",
    "simhash_dups", "embedding_topk_bruteforce", "embedding_topk_ivf",
    "embedding_neardup",
}

#: Queries first registered in round 3 — they need a driver row too,
#: but queue behind the 28 that have waited since round 1.
_NEW_IN_R3 = {
    "dq_fail_gate_violations", "scd2_track_history_subset",
    "cdc_fanout_consistency", "image_decode_stats", "audio_wav_stats",
    "events_csv_malformed_audit", "embedding_topk_ivf_indexed",
    "events_sketch_verified", "embedding_topk_ivf_kmeans_exhaustive",
    "incremental_corpus_dedup", "multi_format_roundtrip",
}

#: Previously-green queries whose IMPLEMENTATION changed in round 3
#: (avg rounding idiom, LM quantization unit, larger IVF codebook,
#: two-tier winnow candidates): their old green rows vouch for code
#: that no longer exists, so they re-enter the window ahead of the
#: untouched greens.
_CHANGED_IN_R3 = {
    "orders_rollup", "orders_cube", "bigram_logprob",
    "embedding_topk_ivf_exhaustive", "winnow_verified_dups",
    "doc_quality_by_source", "unigram_logprob", "events_props_by_type",
    "orders_by_state",
}

#: Queries that received a correctness row in round 2
#: (CORRECTNESS_r02.json — all 50 hash-green).
_R2_CHECKED = {
    "daily_orders", "scalar_function_matrix", "monthly_orders_lag",
    "datetime_function_matrix", "orders_by_state", "dq_drop_quarantine",
    "orders_enriched", "orders_grouping_sets", "seller_performance",
    "shipments_in_order_windows", "category_performance_lag",
    "salted_nation_revenue", "geo_dedup", "scd2_users_incremental",
    "silver_cleanse", "scd1_users_incremental", "top_parts_per_brand",
    "segment_dedup", "valid_orders_filter", "bigram_logprob",
    "dq_violation_summary", "domain_capped_corpus", "pricing_summary",
    "bpe_pair_counts", "revenue_by_nation",
    "embedding_topk_ivf_exhaustive", "orders_building_segment_semi",
    "minhash_verified_dups", "customers_inactive_anti",
    "simhash_verified_dups", "orders_rollup", "winnow_verified_dups",
    "returnflag_pivot", "embedding_neardup_verified",
    "nation_revenue_share", "image_metadata", "daily_revenue_trend",
    "fingerprint_dups", "segment_spend_ranks", "image_resize",
    "parts_above_brand_avg", "video_frame_sample", "daily_orders_gapfill",
    "dataset_split", "daily_channel_full_outer", "source_mixture_sample",
    "priority_region_matrix", "doc_length_buckets", "orders_cube",
    "token_budgets",
}


def _ordered_for_window(
    queries: dict[str, QueryFn], oracles: dict[str, str]
) -> list[tuple[str, QueryFn]]:
    """Order registration for the driver's bounded correctness window
    (~50 rows in registration order). Round-3 goal (VERDICT r2
    next-step #1): close the full set. 75 of 103 queries have a driver
    row across rounds 1-2; the 28 that never got one go FIRST
    (oracled before rows-only), then queries new this round, then the
    previously-green queries whose implementation CHANGED this round
    (a stale green row proves nothing about rewritten code), then the
    round-1-green ones (their rows are oldest), then round-2-green
    last — the window covers never-checked + new + changed, and spare
    slots re-confirm the stalest greens."""
    never_oracled: list[tuple[str, QueryFn]] = []
    never_rows_only: list[tuple[str, QueryFn]] = []
    new_this_round: list[tuple[str, QueryFn]] = []
    changed_this_round: list[tuple[str, QueryFn]] = []
    r1_green: list[tuple[str, QueryFn]] = []
    r2_green: list[tuple[str, QueryFn]] = []
    for item in queries.items():
        name = item[0]
        checked = name in _R1_CHECKED or name in _R2_CHECKED
        if checked and name in _CHANGED_IN_R3:
            changed_this_round.append(item)
        elif name in _R2_CHECKED:
            r2_green.append(item)
        elif name in _R1_CHECKED:
            r1_green.append(item)
        elif name in _NEW_IN_R3:
            new_this_round.append(item)
        elif name in oracles:
            never_oracled.append(item)
        else:
            never_rows_only.append(item)
    return (
        never_oracled
        + never_rows_only
        + new_this_round
        + changed_this_round
        + r1_green
        + r2_green
    )


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
    ordered = _ordered_for_window(queries, all_oracles())
    return {name: _stabilized(fn) for name, fn in ordered}


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
