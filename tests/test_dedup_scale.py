"""Degenerate-corpus scale guards for the MinHash/SimHash LSH family
(VERDICT r4 next-step #1): a corpus region of N identical documents
must NOT create an N²/2-pair shuffle key in candidate generation.

The guard is the identical-signature collapse in
operators/dedup.py (:func:`_collapse_identical_signatures`): banding
sees one representative per distinct signature, and doc-level pairs
are re-expanded only as OUTPUT (equi-join proportional to the true
pair set). These tests plant 10^4 identical docs and assert the
candidate stage stays bounded, plus output-equality invariants on a
small mixed corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.operators.dedup import (
    _collapse_identical_signatures,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash_dedup_pairs,
)


@pytest.fixture(scope="module")
def adversarial(spark):
    """10^4 identical boilerplate docs + 8 distinct docs."""
    boiler = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "click here to accept cookies and continue to the site "
            "terms of service apply all rights reserved"
        ).alias("text"),
    )
    distinct = spark.createDataFrame(
        [
            (100_000 + i, f"unique document number {i} about topic {i * 7} "
                          f"with extra words {i * 13} {i * 17} {i * 19}")
            for i in range(8)
        ],
        "doc_id long, text string",
    )
    return boiler.unionByName(distinct)


def test_minhash_banding_sees_one_representative(spark, adversarial):
    sigs = minhash_signatures(adversarial, "doc_id")
    rep_sigs, members = _collapse_identical_signatures(sigs, "doc_id")
    # 1 signature for the 10^4 identical docs + 8 distinct ones.
    assert rep_sigs.count() == 9
    assert members.count() == 10_008
    # The boilerplate group's representative is its min id.
    rep = (
        members.groupBy("__rep").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .collect()
    )
    assert len(rep) == 1 and rep[0]["__rep"] == 0 and rep[0]["n"] == 10_000


def test_minhash_candidates_bounded_on_identical_flood(spark, adversarial):
    sigs = minhash_signatures(adversarial, "doc_id")
    rep_pairs = minhash_lsh_candidates(
        sigs, "doc_id", expand_identical=False
    )
    # Representative-level candidates: at most C(9, 2) = 36 even if
    # every distinct doc collided in some band; the 10^4-doc group
    # contributes exactly one representative.
    assert rep_pairs.count() <= 36


def test_minhash_expansion_equals_uncollapsed_pairs(spark):
    """On a small mixed corpus the collapsed+expanded pipeline must
    emit exactly the pair set the definition promises: every pair of
    identical docs at est 1.0, and no pair involving unrelated text."""
    group_a = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(5)]
    group_b = [(10 + i, "one two three four five six seven eight") for i in range(4)]
    solo = [(100, "completely unrelated text about something else entirely")]
    df = spark.createDataFrame(group_a + group_b + solo, "doc_id long, text string")
    pairs = minhash_dedup_pairs(df, "doc_id", "text", threshold=0.5)
    rows = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs.collect()}
    expected_a = {(i, j) for i in range(5) for j in range(5) if i < j}
    expected_b = {(10 + i, 10 + j) for i in range(4) for j in range(4) if i < j}
    assert set(rows) == expected_a | expected_b
    assert all(v == 1.0 for v in rows.values())


def test_minhash_max_bucket_df_cuts_hot_buckets(spark):
    """max_bucket_df drops buckets with more DISTINCT signatures than
    the cap: near-identical (but distinct) docs stop producing pairs at
    cap 1, while identical docs still pair (collapse happens first)."""
    near = [
        (i, f"shared boilerplate prefix words here tail {i}") for i in range(20)
    ]
    same = [(100, "identical pair text"), (101, "identical pair text")]
    df = spark.createDataFrame(near + same, "doc_id long, text string")
    sigs = minhash_signatures(df, "doc_id")
    capped = minhash_lsh_candidates(sigs, "doc_id", max_bucket_df=1)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # Identical docs survive any cap: their group collapses to ONE
    # representative (bucket membership 1) and re-expands afterwards.
    assert (100, 101) in got
    uncapped = minhash_lsh_candidates(sigs, "doc_id")
    assert uncapped.count() >= len(got)


def test_simhash_candidates_bounded_on_identical_flood(spark, adversarial):
    rep_pairs = simhash_dedup_pairs(
        adversarial, "doc_id", "text", max_hamming=3, expand_identical=False
    )
    assert rep_pairs.count() <= 36


def test_simhash_expansion_emits_identical_group_pairs(spark):
    group = [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)]
    solo = [(50, "some wholly different words in this document body")]
    df = spark.createDataFrame(group + solo, "doc_id long, text string")
    pairs = simhash_dedup_pairs(df, "doc_id", "text", max_hamming=0)
    rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    expected = {(i, j) for i in range(5) for j in range(5) if i < j}
    assert set(rows) == expected
    assert all(v == 0 for v in rows.values())


def test_span_removal_linear_on_identical_flood(spark, adversarial):
    """Cross-doc span removal on 10^4 identical docs: the plan stays
    linear (occurrence rows = docs x windows, one min+count group per
    gram hash — never a pair blowup) and the semantics hold: the
    (doc_id-)first copy survives verbatim, every other copy is cut to
    empty, and the 8 distinct docs are untouched."""
    from olist_lakehouse_2_0_spark.operators.text import (
        remove_duplicate_spans,
    )

    out = remove_duplicate_spans(adversarial, "doc_id", "text", k=8)
    agg = out.agg(
        F.sum((F.col("removed_tokens") == 0).cast("long")).alias("kept"),
        F.sum(
            ((F.col("doc_id") < 100_000) & (F.col("clean_text") == "")).cast(
                "long"
            )
        ).alias("emptied"),
        F.sum("removed_tokens").alias("total_removed"),
    ).first()
    # doc 0 survives; docs 1..9999 are emptied; 8 distinct docs with no
    # duplicated 8-gram keep all tokens (their windows are unique).
    assert agg.kept == 1 + 8
    assert agg.emptied == 10_000 - 1
    assert agg.total_removed == (10_000 - 1) * 17  # 17 tokens each


def test_minhash_index_append_probe_multi_shard(spark, tmp_path):
    """Corpus-growth contract: shard 2 probes against shards 0 AND 1
    without re-signing either; a degenerate shard (many identical
    docs) contributes ONE banding row per band via the shard-local
    collapse, and its members still all match through the expansion."""
    from olist_lakehouse_2_0_spark.catalog import Catalog
    from olist_lakehouse_2_0_spark.operators.dedup import (
        append_minhash_index,
        probe_minhash_index,
        write_minhash_index,
    )

    cat = Catalog(root=str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "one two three four five six"),
         (3, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    shard1 = spark.createDataFrame(
        [(101, "  alpha beta gamma delta epsilon ")],  # dup of 1
        "doc_id long, text string",
    )
    # degenerate shard: 50 identical copies of doc 2's text
    shard2 = spark.createDataFrame(
        [(200 + i, "one two three four five six") for i in range(50)],
        "doc_id long, text string",
    )
    write_minhash_index(base, cat, "doc_id", "text", shard_id=0)
    append_minhash_index(shard1, cat, "doc_id", "text", shard_id=1)
    append_minhash_index(shard2, cat, "doc_id", "text", shard_id=2)

    # shard-local collapse: shard 2's 50 identical docs -> 16 banding
    # rows (one rep x 16 bands), not 800.
    banding = cat.read(spark, "minhash_banding")
    assert banding.filter(F.col("shard_id") == 2).count() == 16

    got1 = {(r.id_new, r.id_old)
            for r in probe_minhash_index(spark, cat, 1).collect()}
    assert got1 == {(101, 1)}
    got2 = {(r.id_new, r.id_old)
            for r in probe_minhash_index(spark, cat, 2).collect()}
    # every shard-2 copy matches doc 2 (and nothing else) in shards < 2
    assert got2 == {(200 + i, 2) for i in range(50)}


def test_probe_minhash_index_caps_cross_shard_hot_buckets(spark, tmp_path):
    """Many-shards-same-boilerplate flood (VERDICT r6 'What's wrong'
    #3): the identical-signature collapse is shard-local, so 12 shards
    each carrying copies of the same boilerplate accumulate 12
    representatives per (band, bucket) — old_side grows with shard
    count and the uncapped probe pair space with shards². With
    ``max_bucket_df`` the hot buckets drop out of the probe entirely
    (zero boilerplate candidates), while a non-recurring doc planted in
    one old shard still reaches its new-shard twin (its buckets are
    cool), proving the cap bounds candidates without collateral loss."""
    from olist_lakehouse_2_0_spark.catalog import Catalog
    from olist_lakehouse_2_0_spark.operators.dedup import (
        append_minhash_index,
        probe_minhash_index,
        write_minhash_index,
    )

    cat = Catalog(root=str(tmp_path / "wh"))
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    rare = "zephyr quokka obelisk marzipan fjord glyph quartz nimbus"
    n_shards, copies = 12, 5
    for s in range(n_shards):
        rows = [
            (s * 1000 + i, boiler) for i in range(copies)
        ]
        if s == 3:
            rows.append((s * 1000 + 999, rare))  # planted needle
        shard = spark.createDataFrame(rows, "doc_id long, text string")
        if s == 0:
            write_minhash_index(shard, cat, "doc_id", "text", shard_id=0)
        else:
            append_minhash_index(shard, cat, "doc_id", "text", shard_id=s)
    probe = spark.createDataFrame(
        [(90_001, boiler), (90_002, rare)], "doc_id long, text string"
    )
    append_minhash_index(probe, cat, "doc_id", "text", shard_id=n_shards)

    # Uncapped: the boilerplate bucket yields one rep PER SHARD, each
    # expanding to `copies` members — shards·copies candidate pairs for
    # ONE probe doc (the quadratic-in-shards accumulation in miniature).
    uncapped = probe_minhash_index(spark, cat, n_shards).collect()
    boiler_pairs = [r for r in uncapped if r.id_new == 90_001]
    assert len(boiler_pairs) == n_shards * copies

    # Capped at old-side membership 4 (< 12 accumulated reps): the hot
    # buckets leave the probe; the rare needle's buckets hold a single
    # old rep and survive untouched.
    capped = probe_minhash_index(
        spark, cat, n_shards, max_bucket_df=4
    ).collect()
    assert [r for r in capped if r.id_new == 90_001] == []
    assert {(r.id_new, r.id_old) for r in capped} == {(90_002, 3999)}
