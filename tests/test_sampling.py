"""Tests for deterministic hash-based sampling/splitting operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.operators.sampling import (
    hex4_threshold,
    mixture_sample,
    sample_by_rate,
    split_assignment,
)


def test_hex4_threshold_values():
    assert hex4_threshold(0.8) == "cccc"
    assert hex4_threshold(0.5) == "8000"
    assert hex4_threshold(0.25) == "4000"
    assert hex4_threshold(0.0) == "0000"
    assert hex4_threshold(1.0) > "ffff"  # selects everything
    with pytest.raises(ValueError):
        hex4_threshold(1.5)


def test_split_rates_and_stability(spark):
    df = spark.range(0, 20000).select(F.col("id").alias("k"))
    labeled = df.select("k", split_assignment(F.col("k")).alias("split"))
    counts = {r["split"]: r["n"] for r in labeled.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = 20000
    assert counts["train"] / n == pytest.approx(0.8, abs=0.02)
    assert counts["val"] / n == pytest.approx(0.1, abs=0.01)
    assert counts["test"] / n == pytest.approx(0.1, abs=0.01)
    # Stability: same assignment on re-evaluation and under repartition.
    again = (
        df.repartition(7)
        .select("k", split_assignment(F.col("k")).alias("split2"))
    )
    joined = labeled.join(again, "k")
    assert joined.filter(F.col("split") != F.col("split2")).count() == 0


def test_sample_by_rate_is_subset_and_sized(spark):
    df = spark.range(0, 10000).select(F.col("id").alias("k"))
    s50 = sample_by_rate(df, "k", 0.5)
    s25 = sample_by_rate(df, "k", 0.25)
    n50, n25 = s50.count(), s25.count()
    assert n50 / 10000 == pytest.approx(0.5, abs=0.03)
    assert n25 / 10000 == pytest.approx(0.25, abs=0.03)
    # Nested property: the 25% sample is a subset of the 50% sample
    # (same hash, lower threshold) — enables consistent sub-sampling.
    assert s25.join(s50, "k", "left_anti").count() == 0


def test_mixture_sample_rates_per_group(spark):
    rows = [(i, "web" if i % 2 == 0 else "books") for i in range(10000)]
    df = spark.createDataFrame(rows, "k long, source string")
    kept = mixture_sample(df, "k", "source", {"web": 0.3, "books": 1.0})
    by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src["books"] == 5000  # rate 1.0 keeps all
    assert by_src["web"] / 5000 == pytest.approx(0.3, abs=0.04)
    # Unlisted groups are dropped entirely.
    df2 = df.withColumn("source", F.lit("other"))
    assert mixture_sample(df2, "k", "source", {"web": 0.5}).count() == 0


def test_epoch_oversample_rates(spark):
    from olist_lakehouse_2_0_spark.operators.sampling import epoch_oversample

    rows = [(i, "books" if i % 2 == 0 else "web") for i in range(10000)]
    df = spark.createDataFrame(rows, "k long, source string")
    out = epoch_oversample(df, "k", "source", {"books": 2.5, "web": 0.5})
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src["books"] / 5000 == pytest.approx(2.5, abs=0.05)
    assert by_src["web"] / 5000 == pytest.approx(0.5, abs=0.05)
    # Full epochs keep every row; the fractional epoch is a strict subset.
    books = out.filter(F.col("source") == "books")
    per_epoch = {
        r["epoch"]: r["n"]
        for r in books.groupBy("epoch").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_epoch[0] == 5000 and per_epoch[1] == 5000
    assert 0 < per_epoch[2] < 5000
    # Determinism across evaluations.
    again = epoch_oversample(df, "k", "source", {"books": 2.5, "web": 0.5})
    assert out.exceptAll(again).count() == 0


def test_cluster_safe_split_keeps_duplicate_clusters_together(spark):
    """Every member of a cluster gets the cluster representative's
    split — no duplicate of a training row can land in val/test."""
    from pyspark.sql import functions as F

    from olist_lakehouse_2_0_spark.operators.sampling import (
        cluster_safe_split,
        split_assignment,
    )

    rows = [(i, i % 7) for i in range(200)]  # 7 clusters of ~29 docs
    df = spark.createDataFrame(rows, "doc_id long, rep long")
    out = cluster_safe_split(df, "rep")
    per_cluster = (
        out.groupBy("rep")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_cluster)
    # ...and the split IS the representative's own assignment.
    want = {
        r["rep"]: r["split"]
        for r in df.select("rep")
        .distinct()
        .withColumn("split", split_assignment(F.col("rep")))
        .collect()
    }
    got = {r["rep"]: r["split"] for r in out.select("rep", "split").distinct().collect()}
    assert got == want


def test_temperature_mixture_flattens_and_respects_budget(spark):
    """α=0.5 temperature semantics: the SMALL source keeps a strictly
    higher fraction of itself than the big one (that is the point of
    temperature sampling), the total take lands near the budget, runs
    are deterministic, and a budget above the corpus keeps everything
    (rate caps at 1)."""
    from olist_lakehouse_2_0_spark.operators.sampling import (
        temperature_mixture,
    )

    rows = [(i, "big" if i < 9000 else "small") for i in range(10_000)]
    df = spark.createDataFrame(rows, "id long, src string")
    kept = temperature_mixture(df, "id", "src", budget=2_000)
    counts = {
        r.src: r.n
        for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    frac_big = counts["big"] / 9000
    frac_small = counts["small"] / 1000
    assert frac_small > frac_big  # flattening
    # expected takes: 2000·√n_i/(√9000+√1000) → ~1500 big, ~500 small
    assert abs(counts["big"] - 1500) < 150
    assert abs(counts["small"] - 500) < 80
    # deterministic
    again = temperature_mixture(df, "id", "src", budget=2_000)
    assert sorted(r.id for r in kept.collect()) == sorted(
        r.id for r in again.collect()
    )
    # cap-at-1: budget above corpus keeps every row
    assert temperature_mixture(df, "id", "src", budget=50_000).count() == 10_000


def test_temperature_mixture_zero_mass_group_drops_cleanly(spark):
    """A group whose weight mass sums to 0 (all-empty documents) keeps
    nothing — by the explicit pre-division filter, not an
    engine-dependent divide-by-zero NULL — and other groups' rates are
    untouched (√0 contributes nothing to Σ√n)."""
    from olist_lakehouse_2_0_spark.operators.sampling import (
        temperature_mixture,
    )

    rows = [(i, "big" if i < 9000 else "small", 1) for i in range(10_000)]
    rows += [(100_000 + i, "empty", 0) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, src string, w int")
    kept = temperature_mixture(df, "id", "src", budget=2_000, weight_col="w")
    counts = {
        r.src: r.n
        for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert "empty" not in counts
    # the zero-mass group must not perturb the other groups' takes
    base = temperature_mixture(
        df.filter(F.col("src") != "empty"), "id", "src", budget=2_000,
        weight_col="w",
    )
    assert sorted(r.id for r in kept.collect()) == sorted(
        r.id for r in base.collect()
    )
