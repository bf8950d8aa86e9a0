"""Deterministic hash-based sampling / splitting for training-data
pipelines: train/val/test assignment, per-source mixture sampling, and
sequence-length bucketing.

Beyond-reference surface (BASELINE.json north star). Everything here is
keyed on ``md5(key)`` prefixes — a pure, engine-portable function — so:
- assignment is **stable**: a document keeps its split across runs,
  re-partitions, and cluster sizes (no RNG state, no seed plumbing);
- it is **reproducible in any engine** (the DuckDB oracles hash-match);
- it is **shuffle-free**: a narrow per-row projection, no sampling
  shuffle, no driver coordination — the 100 TB path is exactly the
  local path.

The hex-prefix comparison trick: ``substr(md5(k), 1, 4)`` is uniform
over 65536 buckets; comparing against a precomputed hex threshold
string selects any rate with 1/65536 granularity without hex→int
conversion (portable across engines that disagree on hex parsing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Number of hash buckets a 4-hex-char prefix yields.
HEX4_BUCKETS = 16**4


def hex4_threshold(rate: float) -> str:
    """4-char lowercase hex threshold selecting ~``rate`` of keys via
    ``substr(md5(key), 1, 4) < threshold``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * HEX4_BUCKETS), HEX4_BUCKETS), "05x")[-4:] if rate < 1.0 else "g"


def _hex4(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, 4)


def split_assignment(
    key: Column, train: float = 0.8, val: float = 0.1
) -> Column:
    """Stable train/val/test label from the md5 prefix of ``key``.

    Buckets: [0, train) -> 'train', [train, train+val) -> 'val',
    rest -> 'test'. Test share is the remainder.
    """
    h = _hex4(key)
    t_train = hex4_threshold(train)
    t_val = hex4_threshold(train + val)
    return (
        F.when(h < F.lit(t_train), F.lit("train"))
        .when(h < F.lit(t_val), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def cluster_safe_split(
    df: DataFrame,
    cluster_col: str,
    train: float = 0.8,
    val: float = 0.1,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the md5 hash key is the
    CLUSTER representative (the canonical id from a dedup pass — exact
    fingerprint group or connected component), not the row id, so every
    member of a duplicate cluster lands in the SAME split. Splitting on
    the row id instead silently places near-duplicates of training
    documents into val/test — the classic contamination that inflates
    held-out metrics (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL'22, measured train/validation overlap
    in standard corpora precisely because splits ignored duplicate
    structure). Same stable/portable/shuffle-free properties as
    :func:`split_assignment`; the only added cost is whatever join
    attached the cluster id."""
    return df.withColumn(
        out_col, split_assignment(F.col(cluster_col), train, val)
    )


def sample_by_rate(
    df: DataFrame, key_col: str, rate: float
) -> DataFrame:
    """Deterministic ~``rate`` sample: keep rows whose md5 prefix falls
    under the rate threshold. Same rows survive on every run/engine."""
    return df.filter(_hex4(F.col(key_col)) < F.lit(hex4_threshold(rate)))


def mixture_sample(
    df: DataFrame, key_col: str, group_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-group deterministic sampling — the data-mixture primitive:
    each group (e.g. source/domain) keeps its own configured fraction.
    Groups absent from ``rates`` are dropped (rate 0). The rate map
    becomes a literal CASE expression: no join, no shuffle."""
    h = _hex4(F.col(key_col))
    keep = F.lit(False)
    for group, rate in rates.items():
        keep = keep | (
            (F.col(group_col) == group) & (h < F.lit(hex4_threshold(rate)))
        )
    return df.filter(keep)


def temperature_mixture(
    df: DataFrame,
    key_col: str,
    group_col: str,
    budget: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-based mixture sampling at α = 0.5 (the XLM-R /
    multilingual-LM rebalancing: sample source *i* proportional to
    ``p_i^α``, up-weighting small sources, down-weighting dominant
    ones). Given per-group masses ``n_i`` (row counts, or the sum of
    ``weight_col`` — e.g. tokens), the target take from group *i* is
    ``budget · √n_i / Σ_j √n_j``, applied as a deterministic md5-prefix
    keep-rate ``min(1, budget·√n_i / (Σ√n · n_i))``.

    Exactness discipline (the float-pow trap): general ``p^α`` is NOT
    correctly rounded and differs across libms, so only α = 0.5 is
    offered — IEEE-754 ``sqrt`` IS exactly rounded, every engine
    returns the same double. Each ``√n_i`` is then quantized to an
    integer (``floor(√n · 1e6)``: the 1e6 scaling and floor are also
    exact) and everything downstream — the Σ, the rate in 1/65536
    units, the hex threshold — is integer arithmetic in DECIMAL(38,0),
    overflow-safe at any corpus size and bit-identical in any engine.

    Plan: one groupBy for the per-group masses, a one-row total, the
    group→rate map broadcast back onto the corpus, then the same
    shuffle-free md5-prefix filter as :func:`mixture_sample` — the
    corpus itself never shuffles. Adding a new group changes only its
    own rate computation, never the kept set's determinism.

    Zero-mass groups (``Σ weight_col == 0`` — e.g. a source of
    all-empty documents) keep NOTHING, explicitly: they are filtered
    out of the rate table before the division, so their rows simply
    find no rate row in the inner join. Without the filter the rate
    divisor ``__sum_s · __n`` is 0 and the drop would happen as a
    silent engine-dependent NULL (round-5 advice); √n = 0 contributes
    nothing to ``Σ√n`` either way, so every other group's rate is
    unchanged."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    stats = (
        df.groupBy(group_col)
        .agg(F.sum(w).alias("__n"))
        .filter(F.col("__n") > 0)
        .withColumn(
            "__s",
            F.floor(F.sqrt(F.col("__n")) * F.lit(1000000.0)).cast("long"),
        )
    )
    total = stats.agg(F.sum("__s").alias("__sum_s"))
    rates = (
        stats.crossJoin(F.broadcast(total))
        .withColumn(
            "__r16",
            F.expr(
                f"CAST((CAST(65536 AS DECIMAL(38,0)) * {int(budget)} * __s)"
                " DIV (CAST(__sum_s AS DECIMAL(38,0)) * __n) AS BIGINT)"
            ),
        )
        .select(
            group_col,
            "__r16",
            F.lower(F.lpad(F.hex(F.least(F.col("__r16"), F.lit(65535))), 4, "0")).alias(
                "__thr"
            ),
        )
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(
            (F.col("__r16") >= 65536) | (_hex4(F.col(key_col)) < F.col("__thr"))
        )
        .drop("__r16", "__thr")
    )


def epoch_oversample(
    df: DataFrame, key_col: str, group_col: str, rates: dict[str, float]
) -> DataFrame:
    """Mixture sampling with rates above 1.0: a rate of 2.5 repeats
    every row twice and keeps a deterministic half of the third epoch.

    Emits an ``epoch`` column (0-based repeat index). Row (key, epoch)
    survives iff ``epoch < floor(rate)``, or ``epoch == floor(rate)``
    and the md5 prefix of ``key:epoch`` falls under the fractional
    threshold — so the fractional epoch selects a different (but
    stable) subset than epoch 0, as resampling should. Shuffle-free:
    one explode of at most ``ceil(max rate)`` literals per row.
    """
    import math

    if not rates:
        return df.filter(F.lit(False)).withColumn("epoch", F.lit(0))
    max_epochs = max(1, math.ceil(max(rates.values())))
    epoch = F.explode(F.array(*[F.lit(i) for i in range(max_epochs)])).alias(
        "epoch"
    )
    exploded = df.select("*", epoch)
    h = F.substring(
        F.md5(
            F.concat(
                F.col(key_col).cast("string"), F.lit(":"), F.col("epoch")
            )
        ),
        1,
        4,
    )
    keep = F.lit(False)
    for group, rate in rates.items():
        full = int(rate)
        frac = rate - full
        cond = F.col("epoch") < full
        if frac > 0:
            cond = cond | (
            (F.col("epoch") == full) & (h < F.lit(hex4_threshold(frac)))
            )
        keep = keep | ((F.col(group_col) == group) & cond)
    return exploded.filter(keep)


def stratified_cap(
    df: DataFrame, key_col: str, group_col: str, n_per_group: int
) -> DataFrame:
    """Exact per-stratum cap: keep the ``n_per_group`` rows with the
    smallest md5-hash rank inside each group — "at most N documents
    per domain", the exact-count complement of the rate-based
    :func:`mixture_sample`. Deterministic: the same rows survive on
    every run and engine (hash order, ties broken by the key itself).

    Emits ``cap_rank`` (1-based rank within the group) alongside the
    input columns. One shuffle on the group key for the rank window;
    each group's members sort within their partition. For groups with
    hundreds of millions of rows the window sort dominates — pre-filter
    with ``sample_by_rate`` at a rate safely above n/|group| first so
    the sort input is ~n, then apply the exact cap."""
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(
        _hex4(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("cap_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("cap_rank") <= n_per_group)
    )
