"""Declarative data-quality expectations: WARN / DROP ROW / FAIL UPDATE.

Re-implements the reference's constraint system (``CONSTRAINT name
EXPECT (pred) ON VIOLATION DROP ROW | FAIL UPDATE`` and bare ``EXPECT``;
reference src/pipelines/silver/orders.sql:10-22,
src/pipelines/gold/daily_orders.sql:10-13, docs/ARCHITECTURE.md:127-141)
as a DataFrame decorator:

- WARN: rows pass through; violation counts surface via ``Observation``
  metrics piggybacked on the existing action — zero extra scans.
- DROP: violating rows are filtered out; dropped counts observed the
  same way (observe-before-filter).
- FAIL: any violation aborts the update before the write commits.

Scale note: observation metrics are accumulator-style (computed during
the already-running job), so WARN/DROP cost nothing extra at 100 TB.
FAIL defaults to the same observe path when used through
``Pipeline``/``write_with_expectations`` (validate on the temp write,
promote only if clean); the standalone ``enforce`` path uses an
up-front ``isEmpty`` probe which scans only until the first violation.
"""

from __future__ import annotations

import enum
import uuid
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class Action(enum.Enum):
    WARN = "warn"
    DROP = "drop"
    FAIL = "fail"


@dataclass(frozen=True)
class Expectation:
    """A named predicate with a violation policy (reference
    docs/ARCHITECTURE.md:127-141)."""

    name: str
    predicate: Column | str
    action: Action = Action.WARN

    def pred(self) -> Column:
        return F.expr(self.predicate) if isinstance(self.predicate, str) else self.predicate


def expect(name: str, predicate: Column | str) -> Expectation:
    return Expectation(name, predicate, Action.WARN)


def expect_or_drop(name: str, predicate: Column | str) -> Expectation:
    return Expectation(name, predicate, Action.DROP)


def expect_or_fail(name: str, predicate: Column | str) -> Expectation:
    return Expectation(name, predicate, Action.FAIL)


class ExpectationFailed(RuntimeError):
    """Raised when a FAIL expectation has >=1 violating row."""


@dataclass
class ExpectationResult:
    """Handle returned by :func:`enforce`.

    ``df`` is the (possibly filtered) DataFrame to continue the plan
    with. ``metrics()`` returns violation counts per expectation — only
    populated after an action has run on ``df`` (observation semantics).
    """

    df: DataFrame
    observation: Observation | None
    expectation_names: list[str] = field(default_factory=list)
    #: Rows dropped by DROP expectations, tagged with the violated rule
    #: names in ``_violated`` (populated only when ``enforce(...,
    #: quarantine=True)``). A separate plan branch over the same source:
    #: persist the input (or write both sinks in one job) if the source
    #: scan is expensive.
    quarantined: DataFrame | None = None

    def metrics(self) -> dict[str, int]:
        if self.observation is None:
            return {}
        got = self.observation.get
        return {name: int(got[f"violations_{name}"]) for name in self.expectation_names}


def enforce(
    df: DataFrame,
    expectations: list[Expectation],
    fail_strategy: str = "precheck",
    quarantine: bool = False,
) -> ExpectationResult:
    """Apply a set of expectations to ``df``.

    fail_strategy:
      - "precheck": run an ``isEmpty`` probe on FAIL violations now
        (short-circuits at the first bad row; simplest semantics).
      - "defer": skip the probe; the caller must call
        :func:`check_fail_metrics` after its own action (used by the
        pipeline writer for single-pass validate-then-promote).

    quarantine: also expose the rows DROP expectations removed, tagged
    with the violated rule names (``ExpectationResult.quarantined``) —
    the audit-sink pattern: bad rows are preserved for triage instead
    of silently discarded.
    """
    if not expectations:
        return ExpectationResult(df=df, observation=None)

    # FAIL gate (reference gold/daily_orders.sql:10-13: FAIL UPDATE).
    fails = [e for e in expectations if e.action is Action.FAIL]
    if fails and fail_strategy == "precheck":
        combined = None
        for e in fails:
            viol = ~F.coalesce(e.pred(), F.lit(False))
            combined = viol if combined is None else (combined | viol)
        bad = df.filter(combined)
        if not bad.isEmpty():
            raise ExpectationFailed(
                f"FAIL expectation violated: {[e.name for e in fails]}"
            )

    # Observe violation counts for every expectation in one pass.
    counters = [
        F.sum(
            F.when(~F.coalesce(e.pred(), F.lit(False)), 1).otherwise(0)
        ).alias(f"violations_{e.name}")
        for e in expectations
    ]
    if df.isStreaming:
        # Observation handles don't support streaming plans; a
        # string-named observe surfaces per-micro-batch violation
        # counts through StreamingQueryProgress.observedMetrics.
        observation = None
        observed = df.observe(f"dq_{uuid.uuid4().hex[:8]}", *counters)
    else:
        observation = Observation(f"dq_{uuid.uuid4().hex[:8]}")
        observed = df.observe(observation, *counters)

    # DROP filter (reference silver/orders.sql:10-22: ON VIOLATION DROP
    # ROW). NULL predicate result counts as a violation, matching the
    # reference's drop semantics.
    drops = [e for e in expectations if e.action is Action.DROP]
    out = observed
    for e in drops:
        out = out.filter(F.coalesce(e.pred(), F.lit(False)))

    quarantined = None
    if quarantine and drops:
        any_viol = None
        for e in drops:
            viol = ~F.coalesce(e.pred(), F.lit(False))
            any_viol = viol if any_viol is None else (any_viol | viol)
        labels = F.array_compact(
            F.array(
                *[
                    F.when(~F.coalesce(e.pred(), F.lit(False)), F.lit(e.name))
                    for e in drops
                ]
            )
        )
        quarantined = df.filter(any_viol).withColumn("_violated", labels)

    return ExpectationResult(
        df=out,
        observation=observation,
        expectation_names=[e.name for e in expectations],
        quarantined=quarantined,
    )


def check_fail_metrics(result: ExpectationResult, expectations: list[Expectation]) -> None:
    """Post-action FAIL check for the deferred strategy."""
    metrics = result.metrics()
    failed = [
        e.name
        for e in expectations
        if e.action is Action.FAIL and metrics.get(e.name, 0) > 0
    ]
    if failed:
        raise ExpectationFailed(f"FAIL expectation violated: {failed}")


def gate_report(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """The relation the FAIL gate evaluates, AS DATA: one row per
    expectation with its violation count, its action, and whether a
    FAIL-actioned rule with >0 violations would block the update
    (reference gold/daily_orders.sql:10-13 FAIL UPDATE semantics,
    docs/ARCHITECTURE.md:127-141).

    :func:`enforce`'s gate surfaces the same counts only through an
    exception / Observation metrics; this returns them as a DataFrame
    so the gate's decision table is oracle-checkable. One aggregation
    job over ``df`` (all counters in a single pass, map-side partial
    aggregation), then a constant-width unpivot — no per-rule scans.
    """
    if not expectations:
        # df.agg() with zero exprs and F.array() with zero elements
        # both raise; mirror enforce()'s graceful no-op with an empty
        # decision table of the same schema (ADVICE r3).
        return df.sparkSession.createDataFrame(
            [],
            "rule string, action string, violations long, gate_blocks boolean",
        )
    counters = [
        F.sum(
            F.when(~F.coalesce(e.pred(), F.lit(False)), 1).otherwise(0)
        ).cast("long").alias(f"v_{i}")
        for i, e in enumerate(expectations)
    ]
    agg = df.agg(*counters)
    # Column-literal unpivot (explode of struct array), never
    # interpolated SQL text: a rule name containing a quote must stay
    # data, not become part of the expression.
    rows = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("rule"),
                F.lit(e.action.value).alias("action"),
                F.col(f"v_{i}").alias("violations"),
            )
            for i, e in enumerate(expectations)
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.rule", "r.action", "r.violations")
        .withColumn(
            "gate_blocks",
            (F.col("action") == Action.FAIL.value)
            & (F.col("violations") > 0),
        )
    )


def enforce_aggregate(df: DataFrame, checks: dict[str, Column]) -> dict[str, bool]:
    """Table-level FAIL gate: each value is a BOOLEAN AGGREGATE
    expression (e.g. ``F.count(F.lit(1)) > 100``,
    ``F.sum(F.col('v').isNull().cast('int')) / F.count(F.lit(1)) <
    0.01``). The reference's expectations are row-level only
    (CONSTRAINT ... EXPECT, reference src/pipelines/silver/
    orders.sql:10-22); table-level invariants — row-count bounds, null
    share, referential totals — need one aggregate over the whole
    relation, so they can't ride on a per-row filter.

    All checks evaluate in ONE aggregation job (single scan, partial
    aggregation map-side; the collected result is one row of booleans,
    never data rows). Raises :class:`ExpectationFailed` naming every
    failed check; returns the per-check outcomes when all pass."""
    if not checks:
        return {}
    row = df.agg(
        *[F.coalesce(c, F.lit(False)).alias(n) for n, c in checks.items()]
    ).first()
    outcomes = {n: bool(row[n]) for n in checks}
    failed = sorted(n for n, ok in outcomes.items() if not ok)
    if failed:
        raise ExpectationFailed(f"aggregate expectation violated: {failed}")
    return outcomes


def aggregate_gate_report(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """The aggregate FAIL gate's decision relation AS DATA: one row per
    table-level check with its boolean outcome and whether it would
    block the update (every aggregate check is FAIL-actioned — a
    violated table invariant has no row to drop or warn on).

    :func:`enforce_aggregate` surfaces outcomes only through its raise;
    this returns them as a DataFrame so the gate's decision is
    oracle-checkable, mirroring :func:`gate_report` for the row-level
    ladder. One aggregation job (all checks in a single scan, map-side
    partial aggregation), then a constant-width unpivot."""
    if not checks:
        return df.sparkSession.createDataFrame(
            [], "rule string, passed boolean, gate_blocks boolean"
        )
    names = list(checks)
    agg = df.agg(
        *[
            F.coalesce(checks[n], F.lit(False)).alias(f"c_{i}")
            for i, n in enumerate(names)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(n).alias("rule"), F.col(f"c_{i}").alias("passed")
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.rule", "r.passed")
        .withColumn("gate_blocks", ~F.col("passed"))
    )
