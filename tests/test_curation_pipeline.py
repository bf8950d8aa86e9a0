"""End-to-end scale guards for corpus_curation_pipeline: the composed
DAG must keep each stage's degenerate-corpus discipline, and the LSH
stage's hot-bucket cap must be result-invariant (the docstring proof:
set-equal docs collapse before banding, so banded candidates between
distinct representatives can never pass the exact set-equality gate —
the cap only prunes provably-doomed traffic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import olist_lakehouse_2_0_spark.queries.llm_queries as lq


def _write_adversarial_documents(spark, sf_dir: str) -> None:
    """An adversarial `documents` table:

    - 400 NEAR-identical docs (a shared 30-token base + one unique
      trailing token each): distinct shingle sets, hence distinct
      signatures, but most bands collide — the hot-bucket flood the
      cap exists for.
    - 6 EXACT twins of the base (normalized-text duplicates): exercise
      exact dedup, and their shingle-set equality must survive the cap.
    - 20 low-quality docs (5 tokens): must fall to the Gopher filter.
    - 3 benchmark-slice docs (doc_id ≡ 0 mod 97) with an UNRELATED
      vocabulary — every other id sits in a nonzero residue class, so
      the pipeline's decontamination stage drops only the bench slice
      itself, not the corpus (shared 3-grams with the bench set would
      otherwise correctly curate the whole flood away).

    All texts pass/fail the quality thresholds deterministically:
    base = 'the' + 29 five-char tokens -> n=30, mean length 4.93,
    stopword ratio 1/30, zero repeated bigrams.
    """
    base = "the " + " ".join(f"tok{i:02d}" for i in range(29))
    rows = []
    for i in range(400):  # residue 91 (mod 97)
        rows.append((100001 + 97 * i, base + f" zz{i:03d}x", "en", "web"))
    for i in range(6):  # residue 50
        rows.append((50 + 97 * i, base, "en", "web"))
    for i in range(20):  # residue 7
        rows.append((7 + 97 * i, "too short to pass gates", "en", "web"))
    for i in range(3):  # the bench slice: residue 0, alien vocabulary
        rows.append((97 * (2000 + i), "unrelated benchmark speak", "en", "eval"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def adversarial_sf(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("curation_adversarial"))
    _write_adversarial_documents(spark, d)
    return d


def test_bucket_cap_is_result_invariant_end_to_end(
    spark, adversarial_sf, monkeypatch
):
    """The full pipeline manifest must be byte-equal with the LSH
    hot-bucket cap on (64, tight enough to trip on the 400-doc flood)
    and off (None) — the cap may change WORK, never RESULTS."""
    def run():
        out = [
            tuple(r)
            for r in lq.corpus_curation_pipeline(spark, adversarial_sf)
            .orderBy("shard")
            .collect()
        ]
        spark.catalog.clearCache()
        return out

    monkeypatch.setattr(lq, "_CURATION_LSH_BUCKET_CAP", 64)
    capped = run()
    monkeypatch.setattr(lq, "_CURATION_LSH_BUCKET_CAP", None)
    uncapped = run()
    assert capped == uncapped
    assert sum(r[1] for r in capped) > 0  # something survived curation


def test_stage_semantics_on_adversarial_corpus(spark, adversarial_sf):
    """Composition sanity on the adversarial corpus: the 20 low-quality
    docs are gone, the 6 exact twins collapse to the lowest id, and
    each near-identical variant survives near-dup removal (distinct
    shingle sets are NOT near-dup-removed by the set-equality rule)."""
    from olist_lakehouse_2_0_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{adversarial_sf}/documents.parquet")
    n = lq.ops_text.token_count("text")
    quality = docs.filter(n >= 25)
    assert quality.filter(F.col("doc_id") % 97 == 7).count() == 0
    survivors = exact_dedup(quality, "doc_id", "text")
    twins = [
        r["doc_id"]
        for r in survivors.filter(F.col("doc_id") % 97 == 50).collect()
    ]
    # base text also exists nowhere else verbatim, so exactly the
    # lowest twin id survives
    assert twins == [50]
    # the 400 variants are all exact-unique
    assert survivors.filter(F.col("doc_id") >= 100001).count() == 400
