"""Governance view layer: attach column masks + row filters to readers.

OSS equivalent of ``ALTER TABLE ... SET MASK / SET ROW FILTER``
(reference src/setup/apply_masks.sql:24-41): instead of catalog-enforced
policies, the engine builds the reader-facing DataFrame with masked
projections and filter predicates applied, keyed on the session's
groups (``engine.user.groups`` Spark conf).

Masks/filters are plain Column expressions, so Catalyst still pushes
surviving predicates to the scan — governance costs nothing extra at
scale (the mask is computed only on projected rows).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.functions.masking import (
    PRIVILEGED_GROUPS,
    session_groups,
)

MaskFn = Callable[[Column], Column]


@dataclass(frozen=True)
class ColumnMask:
    """Mask ``column`` with ``mask`` unless the session holds one of
    ``exempt_groups`` (reference apply_masks.sql:24-33)."""

    column: str
    mask: MaskFn
    exempt_groups: tuple[str, ...] = PRIVILEGED_GROUPS


@dataclass(frozen=True)
class RegionRowFilter:
    """Row filter on a state column from a group->states map; privileged
    groups see everything; unmatched sessions default to all rows
    (reference pii_masking.sql:83-91)."""

    state_column: str
    group_states: dict[str, tuple[str, ...]] = field(
        default_factory=lambda: {
            "region-southeast": ("SP", "RJ", "MG", "ES"),
            "region-south": ("RS", "SC", "PR"),
        }
    )
    exempt_groups: tuple[str, ...] = PRIVILEGED_GROUPS

    def predicate(self, groups: set[str]) -> Column | None:
        if groups & set(self.exempt_groups):
            return None
        allowed: list[str] = []
        for group, states in self.group_states.items():
            if group in groups:
                allowed.extend(states)
        if not allowed:
            return None  # default TRUE: everyone else sees all rows
        return F.col(self.state_column).isin(*allowed)


@dataclass
class ProtectedTable:
    """A DataFrame wrapped with governance policies."""

    masks: list[ColumnMask] = field(default_factory=list)
    row_filter: RegionRowFilter | None = None

    def read(self, spark: SparkSession, df: DataFrame) -> DataFrame:
        groups = session_groups(spark)
        if self.row_filter is not None:
            pred = self.row_filter.predicate(groups)
            if pred is not None:
                df = df.filter(pred)
        for mask in self.masks:
            if groups & set(mask.exempt_groups):
                continue
            if mask.column in df.columns:
                df = df.withColumn(mask.column, mask.mask(F.col(mask.column)))
        return df
