"""Brazilian state -> region CASE maps.

The reference carries three hand-maintained copies of this CASE
expression with deliberately different coverage (SURVEY §7.4): the
silver copies map all 27 states (reference src/pipelines/silver/
sellers.sql:33-62, geolocation.sql:41-70) while the gold copy omits
Midwest/North so unmapped states fall through to 'Other'
(src/pipelines/gold/orders_by_state.sql:30-52). Both variants are
exposed; per-site fidelity is preserved by choosing the right map.

Scale note: a chained CASE stays inside whole-stage codegen — cheaper
than a broadcast-join lookup for maps this small.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SOUTHEAST = ("SP", "RJ", "MG", "ES")
SOUTH = ("RS", "SC", "PR")
NORTHEAST = ("BA", "PE", "CE", "MA", "PB", "RN", "AL", "PI", "SE")
MIDWEST = ("GO", "MT", "MS", "DF")
NORTH = ("AM", "PA", "RO", "RR", "AC", "AP", "TO")

#: Full 27-state map (silver-layer variant).
FULL_REGION_MAP: dict[str, tuple[str, ...]] = {
    "Southeast": SOUTHEAST,
    "South": SOUTH,
    "Northeast": NORTHEAST,
    "Midwest": MIDWEST,
    "North": NORTH,
}

#: Gold-layer variant: Midwest/North deliberately absent -> 'Other'.
PARTIAL_REGION_MAP: dict[str, tuple[str, ...]] = {
    "Southeast": SOUTHEAST,
    "South": SOUTH,
    "Northeast": NORTHEAST,
}


def region_case(state: Column | str, mapping: dict[str, tuple[str, ...]], default: str = "Other") -> Column:
    """Build the chained CASE expression for a state->region mapping."""
    col = F.col(state) if isinstance(state, str) else state
    expr: Column | None = None
    for region, states in mapping.items():
        cond = col.isin(*states)
        expr = F.when(cond, region) if expr is None else expr.when(cond, region)
    assert expr is not None
    return expr.otherwise(F.lit(default))


def full_region(state: Column | str) -> Column:
    return region_case(state, FULL_REGION_MAP)


def partial_region(state: Column | str) -> Column:
    return region_case(state, PARTIAL_REGION_MAP)
