"""Skew-mitigation join utilities.

AQE's skew-join splitting (enabled in :mod:`..session`) handles most
runtime skew by splitting oversized shuffle partitions. Salting is the
complementary *plan-level* tool for pathological producer skew — a
handful of keys holding a double-digit percentage of a 100 TB fact
table — where even a split partition leaves one task per hot key
chain. Salting spreads EACH key across ``salt`` tasks.

Cost model: the skewed side adds a content-derived salt (splits each
key's rows across ``salt`` buckets); the other side is replicated
``salt`` times via a literal-range explode. Use only when the
replicated side is small-ish per key (dimension or pre-aggregated) and
the skew is known; for broadcast-able sides, ``F.broadcast`` is always
cheaper.

Measured guidance (scripts/bench_skew.py, BASELINE.md round-5 table):
on a 38M-row fixture with a 33%-hot key and a 150k-row dimension,
plain sort-merge (with or without AQE) beat ``salted_join`` ~1.7x and
plain groupBy beat ``salted_agg`` ~5x — dimension replication costs
half a fact scan, and map-side partial aggregation already collapses
hot keys for algebraic metrics. PREFER AQE skew-split by default.
Salting earns its cost only when a hot task exceeds single-task
limits rather than merely running longer: >2 GB shuffle blocks or
multi-minute stragglers (one key = double-digit % of a 100 TB fact),
plans AQE cannot re-split (foreachBatch micro-batches), or
non-combinable aggregation states (collect_list-style partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the ``skewed`` side salted across ``salt``
    sub-keys and ``other`` replicated to match.

    Deterministic salting without an RNG: the salt derives from
    ``xxhash64`` over the skewed ROW'S OWN CONTENT (``salt_cols``,
    default every column), so a row maps to the same salt group on
    every evaluation — including a shuffle-fetch-failure recompute of
    one map task on a real cluster, where a
    ``monotonically_increasing_id``-derived salt could reassign rows
    between the partial and merge stages (the SPARK-23207 hazard class;
    ADVICE r4). Join results are identical to
    ``skewed.join(other, on, how)`` for ``inner``/``left`` (each
    skewed row still matches exactly the same ``other`` rows — one
    replica). Caveat: byte-identical duplicate rows share a salt
    group; pass a high-cardinality ``salt_cols`` subset (e.g. a line
    id) if the hot key's rows are themselves duplicates.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    cols = salt_cols if salt_cols is not None else skewed.columns
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt)
    ).cast("int")
    s = skewed.withColumn("__salt", salt_col)
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return s.join(o, [on, "__salt"], how).drop("__salt")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval join without a nested-loop plan: match every
    ``points`` row whose numeric ``point_col`` falls in the half-open
    ``[start_col, end_col)`` of an ``intervals`` row.

    Spark has no native range join (a bare ``p >= s AND p < e``
    condition plans as BroadcastNestedLoopJoin, or a full cartesian
    when neither side fits in memory). This is the standard bucketed
    rewrite: both sides map into fixed-width buckets — points to their
    containing bucket, intervals exploded across every bucket they
    overlap — then an ordinary hash equi-join on the bucket id feeds
    the exact containment filter. Shuffle volume is
    |points| + |intervals| x avg_buckets_per_interval, never
    |points| x |intervals|.

    All three columns must be numeric and in the same unit (cast
    dates/timestamps to epoch days/seconds first). Pick
    ``bucket_width`` near the median interval length: much smaller
    multiplies the interval-side explode; much larger degrades the
    equi-join toward all-pairs within a bucket. Long-tail intervals
    spanning many buckets are the skew case — AQE skew-split territory,
    or cap interval length upstream.
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("long"),
                # Last candidate bucket is floor(end/width): correct for
                # all reals (floor((end-1)/width) drops the final bucket
                # for fractional data, e.g. [0, 7.5) width 7 must probe
                # bucket 1 for point 7.2). When end lands exactly on a
                # boundary this over-explodes by one bucket, which the
                # exact containment filter below removes; greatest()
                # keeps degenerate (empty) intervals from exploding to a
                # negative range.
                F.greatest(
                    F.floor(F.col(end_col) / bucket_width).cast("long"),
                    F.floor(F.col(start_col) / bucket_width).cast("long"),
                ),
            )
        ),
    )
    return (
        p.join(i, "__bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bucket")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, "F.Column | str"]],
    salt: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation: partial-aggregate on
    ``keys + salt``, then merge the partials on ``keys`` alone.

    The plan-level counterpart of :func:`salted_join` for GROUP BY
    skew: a hot group key (one nation holding 30% of a 100 TB fact
    table) funnels its entire reduce work into one task even with
    map-side combine, because the final merge for that key is a single
    shuffle partition. Salting splits each key's rows across ``salt``
    partial groups first; the second aggregation then merges at most
    ``salt`` pre-collapsed rows per key — O(|keys| x salt) input, never
    fact-table sized. (Spark's map-side partial aggregation already
    gives one partial per map TASK; salting bounds the REDUCE fan-in
    per key, which is what a hot key overwhelms.)

    ``metrics`` maps output alias -> (fn, column) with fn one of
    ``sum`` / ``count`` / ``min`` / ``max`` — the algebraic aggregates
    whose two-phase split is exact (count merges via sum). Non-algebraic
    aggregates (exact distinct, medians) cannot be salted this way; use
    the dedicated sketch/exact paths instead.

    The salt derives from ``xxhash64`` over the ROW'S OWN CONTENT
    (``salt_cols``, default every column), so a row maps to the same
    partial group on every evaluation — a
    ``monotonically_increasing_id`` salt would be non-deterministic
    under a shuffle-fetch-failure recompute (rows could move between
    salt groups between the partial and merge stages: the SPARK-23207
    hazard class; ADVICE r4). Results are identical to the unsalted
    GROUP BY under any spread because the merge re-combines every
    partial; determinism matters for the EXECUTION (retry-safe task
    outputs), not the result values. Byte-identical duplicate rows
    share a salt group — pass a high-cardinality ``salt_cols`` (e.g. a
    line id) when a hot key's rows are themselves duplicates.
    """
    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for alias, (fn, _) in metrics.items():
        if fn not in _MERGE:
            raise ValueError(f"{alias}: unsupported salted aggregate {fn!r}")
    cols = salt_cols if salt_cols is not None else df.columns
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt)
    ).cast("int")
    partial = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _PARTIAL[fn](col).alias(alias)
                for alias, (fn, col) in metrics.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](alias).alias(alias)
            for alias, (fn, _) in metrics.items()
        ]
    )
