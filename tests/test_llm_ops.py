"""Quality checks for the approximate operators against exact baselines,
plus multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.catalog import load
from olist_lakehouse_2_0_spark.operators.dedup import (
    embedding_neardup_pairs,
    jaccard_pairs,
    minhash_dedup_pairs,
    simhash_dedup_pairs,
)
from olist_lakehouse_2_0_spark.operators.multimodal import (
    FAKE_MAGIC,
    decode_image,
    extract_image_metadata,
    sample_frames,
    synthesize_image_column,
)
from olist_lakehouse_2_0_spark.operators.similarity import cosine_topk, ivf_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_with_dups(spark):
    docs = load(spark, SF, "documents").select("doc_id", "text")
    copies = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    return docs.unionByName(copies)


def test_minhash_recall_vs_exact(spark, corpus_with_dups):
    """LSH candidates + signature estimate must recover most true
    high-Jaccard pairs (64 hashes / 16 bands, s-curve ~0.5)."""
    exact = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(
            corpus_with_dups, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    assert len(exact) > 0
    approx = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(
            corpus_with_dups, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall} on {len(exact)} true pairs"


def test_simhash_finds_perturbed_dups(spark, corpus_with_dups):
    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_dedup_pairs(
            corpus_with_dups, "doc_id", "text", max_hamming=3
        ).collect()
    }
    n_docs = corpus_with_dups.count() // 2
    found = sum(1 for (a, b) in pairs if b - a == 1000000)
    # One appended token flips more bits on short docs: ~0.75 recall at
    # hamming<=3 is expected simhash behavior, not an implementation bug.
    assert found >= n_docs * 0.7, f"simhash found {found}/{n_docs} planted dups"
    # No precision assert: the testdata's 40-word vocabulary makes
    # distinct docs with matching token-frequency profiles legitimately
    # collide at hamming 0-3 — correct simhash behavior.


def test_ivf_recall_vs_bruteforce(spark):
    emb = load(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    exact = {
        (r.query_id, r.corpus_id)
        for r in cosine_topk(queries, corpus, k=5).collect()
    }
    approx = {
        (r.query_id, r.corpus_id)
        for r in ivf_topk(queries, corpus, k=5, num_centroids=8, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # nprobe/num_centroids = 0.5 of the corpus scanned; random unit
    # vectors are near-orthogonal so recall is imperfect by design —
    # assert it beats the scanned fraction meaningfully.
    assert recall >= 0.6, f"ivf recall {recall}"


def test_embedding_neardup_self_duplicates(spark):
    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    copies = emb.select((F.col("vec_id") + 5000).alias("vec_id"), "embedding")
    both = emb.unionByName(copies)
    pairs = embedding_neardup_pairs(both, "vec_id", "embedding", threshold=0.999)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    n = emb.count()
    planted = sum(1 for (a, b) in found if b - a == 5000)
    # identical vectors always share every hyperplane bucket -> 100% recall
    assert planted == n


def test_image_pipeline_roundtrip(spark):
    docs = load(spark, SF, "documents").select("doc_id").limit(50)
    with_payload = synthesize_image_column(docs, "doc_id")
    row = with_payload.first()
    assert bytes(row.image[:4]) == FAKE_MAGIC
    meta = extract_image_metadata(with_payload)
    rows = meta.collect()
    assert all(r.image_meta["format"] == "fimg" for r in rows)
    assert all(16 <= r.image_meta["width"] < 80 for r in rows)
    got = {r.doc_id: r.image_meta["width"] for r in rows}
    assert all(w == doc_id % 64 + 16 for doc_id, w in got.items())


def test_decode_image_fake_format_still_raises():
    # FIMG fake payloads carry no pixels; only real formats decode.
    with pytest.raises(NotImplementedError):
        decode_image(FAKE_MAGIC + b"\x10\x00\x10\x00\x03")


def test_bmp_roundtrip_and_resize():
    """Real codec path: encode -> decode is exact, nearest-neighbor
    resize picks the expected source pixels, odd widths exercise the
    4-byte row padding."""
    import numpy as np

    from olist_lakehouse_2_0_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )

    rng = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    payload = encode_bmp(rng)
    assert payload[:2] == b"BM"
    decoded = decode_bmp(payload)
    assert decoded.shape == (5, 7, 3)
    assert (decoded == rng).all()

    small = resize_nearest(decoded, (3, 2))  # (width, height)
    assert small.shape == (2, 3, 3)
    yi = (np.arange(2) * 5) // 2
    xi = (np.arange(3) * 7) // 3
    assert (small == rng[yi][:, xi]).all()
    # decode_image dispatches BMP to the real path
    assert (decode_image(payload) == rng).all()


def test_wav_roundtrip():
    import numpy as np

    from olist_lakehouse_2_0_spark.operators.multimodal import (
        decode_audio,
        decode_wav,
        encode_wav,
    )

    samples = np.array([0, 1000, -1000, 32767, -32768, 7], dtype=np.int16)
    payload = encode_wav(samples, 16000)
    sr, channels, wave = decode_wav(payload)
    assert (sr, channels) == (16000, 1)
    assert (wave == samples).all()
    assert (decode_audio(payload)[2] == samples).all()


def test_resize_images_real_bmp_payloads(spark):
    """resize_images on BMP payloads must replace the payload with a
    re-encoded image of the target size whose pixels match the
    nearest-neighbor law."""
    import numpy as np

    from olist_lakehouse_2_0_spark.operators.multimodal import (
        decode_bmp,
        resize_images,
        resize_nearest,
        synthesize_bmp_column,
    )

    docs = load(spark, SF, "documents").select("doc_id").limit(20)
    resized = resize_images(
        synthesize_bmp_column(docs, "doc_id"), target=(6, 5)
    ).collect()
    assert all(r.resized_width == 6 and r.resized_height == 5 for r in resized)
    for r in resized[:5]:
        arr = decode_bmp(bytes(r.image))
        assert arr.shape == (5, 6, 3)
        i = r.doc_id
        w, h = i % 8 + 4, (i * 3) % 8 + 4
        grid = (np.add.outer(np.arange(h), np.arange(w)) + i) % 256
        src = np.repeat(grid[:, :, None], 3, axis=2).astype(np.uint8)
        assert (arr == resize_nearest(src, (6, 5))).all()


def test_sample_frames_shape(spark):
    docs = load(spark, SF, "documents").select("doc_id").limit(10)
    frames = sample_frames(docs, "doc_id", n_frames=4)
    assert frames.count() == 40
    assert frames.groupBy("doc_id").count().filter("count != 4").count() == 0


def test_winnow_partial_overlap(spark):
    """Winnowing must recover a planted partial-overlap pair (copy
    shares a long prefix substring but diverges after) while unrelated
    documents with disjoint text share no fingerprints."""
    from olist_lakehouse_2_0_spark.operators.text import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    rows = [
        (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
        (2, "alpha bravo charlie delta echo foxtrot golf ZZZ QQQ WWW XYZZY"),
        (3, "one completely different sentence about nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = winnow_overlap_pairs(df, "doc_id", "text", k=8, window=4, min_overlap=0.3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)

    # identical docs -> identical fingerprint sets
    fp = df.select("doc_id", winnow_fingerprints("text").alias("fp")).collect()
    by_id = {r.doc_id: tuple(r.fp) for r in fp}
    assert by_id[1] and by_id[1] != by_id[3]


def test_winnow_dup_candidates_recall_for_common_fingerprint_docs(spark):
    """The two-tier candidate generator must catch exact-dup pairs
    whose EVERY fingerprint exceeds the df cut (tier 1 erases them;
    tier 2's identical-set signature must recover them), while rare
    partial-overlap pairs still come from tier 1."""
    from olist_lakehouse_2_0_spark.operators.text import winnow_dup_candidates

    common = "the same boiler plate sentence repeated in every document here"
    rows = []
    # 10 distinct docs all built ONLY from the common sentence -> every
    # fingerprint has df ~10 > max_fp_df=4; docs 100/101 are exact dups.
    for i in range(100, 110):
        rows.append((i, common))
    rows.append((200, "rare unique wording appears solely in this entry alone"))
    rows.append((201, "rare unique wording appears solely in this entry alone"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b)
        for r in winnow_dup_candidates(
            df, "doc_id", "text", k=8, window=4, max_fp_df=4
        ).collect()
    }
    # all-common exact dups recovered via the signature tier
    assert (100, 101) in got
    # rare-fingerprint dups recovered via the inverted-index tier
    assert (200, 201) in got
    # no cross-tier false pairing between unrelated text groups
    assert all(not (a < 200 <= b) for a, b in got)


def test_dedup_components_clusters_pairs(spark):
    """Min-label propagation must produce one component per connected
    pair group, labeled by the smallest member id, including chains
    (1-2, 2-3 => {1,2,3}) and isolated pairs."""
    from olist_lakehouse_2_0_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    comp = {r["doc_id"]: r["component"] for r in dedup_components(pairs).collect()}
    assert comp == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
    }


def test_ivf_kmeans_recall_vs_bruteforce(spark):
    """K-means-refined IVF must reach reasonable top-10 recall against
    the exact brute-force baseline at nprobe=4/16 centroids."""
    from olist_lakehouse_2_0_spark.catalog import load
    from olist_lakehouse_2_0_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_kmeans,
    )

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    exact = {
        (r["query_id"], r["corpus_id"])
        for r in cosine_topk(queries, corpus, k=10).collect()
    }
    approx = {
        (r["query_id"], r["corpus_id"])
        for r in ivf_topk_kmeans(queries, corpus, k=10, num_centroids=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f}"


def test_embedding_neardup_zero_vectors_excluded(spark):
    """Zero-norm vectors produce NaN cosine; NaN must not pass the
    threshold (Spark orders NaN above every number). Null embeddings
    and empty inputs must not crash plan construction."""
    from olist_lakehouse_2_0_spark.operators.dedup import embedding_neardup_pairs

    rows = [
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
        (4, [1.0, 0.0, 0.0, 0.0]),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(df, "vec_id", "embedding").collect()
    }
    assert (3, 4) in got
    assert all(1 not in p and 2 not in p and 5 not in p for p in got)

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_neardup_pairs(empty, "vec_id", "embedding").count() == 0


# ---------------------------------------------------------------------------
# PII redaction / quality heuristics / decontamination
# ---------------------------------------------------------------------------


def test_redact_pii_all_classes(spark):
    from olist_lakehouse_2_0_spark.operators.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org today"),
            (2, "call 415-555-0042 or 415-555-0043"),
            (3, "server at 10.1.2.3 responded"),
            (4, "clean text, no pii"),
            (5, ""),
        ],
        "id long, text string",
    )
    out = {
        r.id: r
        for r in df.select(
            "id",
            pii_counts("text").alias("c"),
            redact_pii("text").alias("red"),
        ).collect()
    }
    assert out[1].c.n_email == 1 and "[EMAIL]" in out[1].red
    assert "@" not in out[1].red
    assert out[2].c.n_phone == 2 and out[2].red.count("[PHONE]") == 2
    assert out[3].c.n_ip == 1 and "[IP]" in out[3].red
    assert out[4].red == "clean text, no pii"
    assert out[5].red == ""


def test_dup_ngram_frac_bounds(spark):
    from olist_lakehouse_2_0_spark.operators.text import dup_ngram_frac

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # bigrams: ab ba ab ba ab -> 2 distinct / 5
            (2, "a b c d e"),        # all distinct -> 0.0
            (3, "x"),                # shorter than n -> 0.0
            (4, ""),
        ],
        "id long, text string",
    )
    got = {
        r.id: r.f
        for r in df.select("id", dup_ngram_frac("text", 2).alias("f")).collect()
    }
    assert abs(got[1] - (1 - 2 / 5)) < 1e-12
    assert got[2] == 0.0
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_contaminated_docs_semantics(spark):
    from olist_lakehouse_2_0_spark.operators.text import contaminated_docs

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox yesterday"),  # shares 2 grams
            (2, "totally different words here now"),       # clean
            (3, "quick brown fox quick brown fox"),        # shares 1 distinct gram
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_hits
        for r in contaminated_docs(corpus, bench, "doc_id", "text", n=3).collect()
    }
    # doc 1: "the quick brown", "quick brown fox" both in bench;
    # doc 3 repeats "quick brown fox" but distinct hits count once
    assert got == {1: 2, 3: 1}


def test_dedup_components_cliques_matches_iterative(spark):
    """The closed-form cliques path must agree with the iterative
    propagation on an equality-keyed (clique-shaped) pair graph."""
    from olist_lakehouse_2_0_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (20, 21), (20, 22), (21, 22)],
        "id_a long, id_b long",
    )
    expected = {
        r["doc_id"]: r["component"] for r in dedup_components(pairs).collect()
    }
    fast = {
        r["doc_id"]: r["component"]
        for r in dedup_components(pairs, cliques=True).collect()
    }
    assert fast == expected == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20,
    }


def test_segment_dedup_stats_flags_shared_prefix(spark):
    """A document sharing its first segments with another doc gets
    exactly those segments flagged; unique tails survive with their
    token counts intact."""
    from olist_lakehouse_2_0_spark.operators.text import segment_dedup_stats

    base = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, base + " unique one tail here now extra pad toks ok fine"),
            (2, base + " other distinct ending words go here right now yes ok"),
            (3, "completely different text with exactly its own ten words here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in segment_dedup_stats(
            docs, "doc_id", "text", seg_tokens=10, min_docs=2
        ).collect()
    }
    # docs 1 and 2: segments 0-9 and 10-19 shared, final 10-token tail unique
    for d in (1, 2):
        assert out[d]["n_segments"] == 3
        assert out[d]["n_shared_segments"] == 2
        assert out[d]["n_tokens"] == 30
        assert out[d]["n_kept_tokens"] == 10
        assert abs(out[d]["shared_frac"] - 2 / 3) < 1e-12
    assert out[3]["n_shared_segments"] == 0
    assert out[3]["n_kept_tokens"] == 10


def test_token_pair_counts_orders_and_ties(spark):
    """Pair counting must count in-order adjacencies (not distinct
    pairs) and break count ties by pair text ascending."""
    from olist_lakehouse_2_0_spark.operators.text import token_pair_counts

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x")],
        "doc_id long, text string",
    )
    rows = token_pair_counts(docs, "text", top_n=10).collect()
    assert [(r["pair"], r["occurrences"], r["rank"]) for r in rows] == [
        ("a b", 3, 1),
        ("b a", 1, 2),
        ("b c", 1, 3),
        ("b x", 1, 4),
    ]


def test_bm25_topk_matches_reference_implementation(spark):
    """bm25_topk pinned against an independent plain-Python Okapi BM25
    (same k1/b, same integer 1e-6 quantization) on a tiny corpus."""
    import math

    from olist_lakehouse_2_0_spark.operators.text import bm25_topk

    corpus = {
        1: "apple banana apple",
        2: "apple cherry",
        3: "banana banana banana banana",
        4: "cherry cherry durian",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    queries = [("qa", "apple"), ("qa", "banana"), ("qb", "cherry")]
    qdf = spark.createDataFrame(queries, "query_id string, term string")

    # Independent reference
    toks = {d: t.split() for d, t in corpus.items()}
    n = len(toks)
    tot = sum(len(v) for v in toks.values())
    df = {}
    for terms in toks.values():
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    k1, b = 1.2, 0.75
    expected = {}
    for qid in {q for q, _ in queries}:
        scores = {}
        for d, terms in toks.items():
            units = 0
            hit = False
            for _, t in [(q, t) for q, t in queries if q == qid]:
                tf = terms.count(t)
                if tf == 0:
                    continue
                hit = True
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                rel = (len(terms) * n) / tot
                sat = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * rel))
                units += math.floor(idf * sat * 1e6 + 0.5)
            if hit:
                scores[d] = units
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for r, (d, u) in enumerate(ranked, start=1):
            expected[(qid, d)] = (u, r)

    got = {
        (r.query_id, r.doc_id): (r.score_units, r.rank)
        for r in bm25_topk(docs, qdf, k=10).collect()
    }
    assert got == expected
    # Sanity on the semantics the numbers encode: for the cherry query
    # the short cherry-heavy doc 4 must outrank the longer mixed doc 2.
    assert got[("qb", 4)][1] == 1 and got[("qb", 2)][1] == 2


def test_bpe_train_matches_plain_python_reference(spark):
    """The full iterative BPE loop (SentencePiece-style: flattened
    symbol stream with the ▁ word marker, merges may span the marker)
    must learn the same merge table as an independent plain-Python
    implementation, ties broken lexicographically."""
    from olist_lakehouse_2_0_spark.operators.text import bpe_train

    texts = [
        "low lower lowest",
        "new newer newest",
        "low low new new",
        "wider wide wide",
    ]

    def ref_bpe(texts, n_merges, min_count=2):
        docs = [
            [s for w in t.split() for s in ["▁", *list(w)]] for t in texts
        ]
        merges = []
        for _ in range(n_merges):
            counts = {}
            for d in docs:
                for a, b in zip(d, d[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + 1
            if not counts:
                break
            (l, r), n = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if n < min_count:
                break
            merges.append((l, r, n))
            new_docs = []
            for d in docs:
                out, i = [], 0
                while i < len(d):
                    if i + 1 < len(d) and d[i] == l and d[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(d[i])
                        i += 1
                new_docs.append(out)
            docs = new_docs
        return merges

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, "text", n_merges=8)
    want = ref_bpe(texts, 8)
    assert got == want
    assert len(got) == 8  # this corpus supports all 8 merges


def test_bpe_encode_applies_learned_merges_in_order(spark):
    """Encoding with the trained merge table reproduces the reference
    implementation's final symbol sequences (same greedy left-to-right
    application, same order), and strictly shortens token streams."""
    from pyspark.sql import functions as F

    from olist_lakehouse_2_0_spark.operators.text import bpe_encode, bpe_train

    texts = ["low lower lowest", "new newer newest", "low low new new"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = bpe_train(df, "text", n_merges=6)
    assert len(merges) == 6

    def ref_encode(t):
        d = [s for w in t.split() for s in ["▁", *list(w)]]
        for l, r, _ in merges:
            out, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == l and d[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(d[i])
                    i += 1
            d = out
        return d

    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_encode(df, "text", merges).collect()
    }
    want = {i: ref_encode(t) for i, t in enumerate(texts)}
    assert got == want
    raw_lens = {i: len([s for w in t.split() for s in ["▁", *list(w)]])
                for i, t in enumerate(texts)}
    assert all(len(got[i]) < raw_lens[i] for i in got)


def test_dedup_segments_within_doc_keeps_first_occurrence(spark):
    from olist_lakehouse_2_0_spark.operators.text import (
        dedup_segments_within_doc,
    )

    df = spark.createDataFrame(
        [
            # "a b" repeats (segments: "a b","c d","a b","e") -> drop 2nd
            (1, "a b c d a b e"),
            # no repeats
            (2, "x y z w"),
            # whole doc is one repeated segment
            (3, "p q p q p q"),
            # empty and whitespace-only stay empty
            (4, ""),
            (5, "   "),
        ],
        "id int, text string",
    )
    out = {
        r.id: r.clean
        for r in df.select(
            "id", dedup_segments_within_doc("text", 2).alias("clean")
        ).collect()
    }
    assert out[1] == "a b c d e"
    assert out[2] == "x y z w"
    assert out[3] == "p q"
    assert out[4] == ""
    assert out[5] == ""


def test_remove_duplicate_spans_cross_doc_keep_first(spark):
    """Lee et al. '22 exact-substring semantics: every occurrence of a
    duplicated k-token span EXCEPT the globally first (by (id, pos))
    is cut; maximal shared runs longer than k are removed whole; docs
    shorter than k and unique text are untouched."""
    from olist_lakehouse_2_0_spark.operators.text import (
        remove_duplicate_spans,
    )

    shared = "s1 s2 s3 s4"  # 4-token run duplicated across docs 1..3
    df = spark.createDataFrame(
        [
            # first occurrence of the shared run: kept verbatim
            (1, f"a b {shared} c d"),
            # later occurrence embedded in different context: run cut
            (2, f"x y z {shared} w v u t"),
            # exact whole-doc copy of doc 2: everything duplicated
            (3, f"x y z {shared} w v u t"),
            # unique doc: untouched
            (4, "q r s t u v w x"),
            # shorter than k: untouched even though it repeats itself
            (5, "m m m"),
            (6, ""),
        ],
        "id int, text string",
    )
    out = {
        r.id: (r.orig_tokens, r.removed_tokens, r.clean_text)
        for r in remove_duplicate_spans(df, "id", "text", k=4).collect()
    }
    assert out[1] == (8, 0, f"a b {shared} c d")
    # doc 2: only windows fully inside the shared run duplicate doc 1
    # ("x y z s1" etc. also appear in doc 3, but doc 2 precedes doc 3,
    # so doc 2 keeps them) -- the 4 shared-run tokens are cut.
    assert out[2] == (11, 4, "x y z w v u t")
    # doc 3: every window duplicates doc 2 -> whole doc removed
    assert out[3] == (11, 11, "")
    assert out[4] == (8, 0, "q r s t u v w x")
    assert out[5] == (3, 0, "m m m")
    assert out[6] == (0, 0, "")


def test_remove_duplicate_spans_intra_doc_and_overlap_merge(spark):
    """A span repeated WITHIN one document keeps its first occurrence;
    overlapping duplicated windows merge into one maximal cut (an
    m-token shared run removes exactly m tokens, not m-k+1 windows
    times k)."""
    from olist_lakehouse_2_0_spark.operators.text import (
        remove_duplicate_spans,
    )

    # "p1 p2 p3" appears at pos 0 and again at pos 5 (k=3).
    df = spark.createDataFrame(
        [(1, "p1 p2 p3 a b p1 p2 p3 c")],
        "id int, text string",
    )
    (row,) = remove_duplicate_spans(df, "id", "text", k=3).collect()
    assert (row.orig_tokens, row.removed_tokens) == (9, 3)
    assert row.clean_text == "p1 p2 p3 a b c"

    # 6-token run shared between two docs with k=3: doc 2 loses all 6
    # tokens (4 overlapping windows merge), keeps its unique suffix.
    df2 = spark.createDataFrame(
        [(1, "r1 r2 r3 r4 r5 r6"), (2, "r1 r2 r3 r4 r5 r6 zz yy xx")],
        "id int, text string",
    )
    out = {
        r.id: (r.removed_tokens, r.clean_text)
        for r in remove_duplicate_spans(df2, "id", "text", k=3).collect()
    }
    assert out[1] == (0, "r1 r2 r3 r4 r5 r6")
    assert out[2] == (6, "zz yy xx")


def test_multi_pattern_hits_equals_instr_join(spark, sf_correctness):
    """The Aho-Corasick scan must produce exactly the (doc, needle)
    pairs of the per-needle instr join — including overlapping needles
    and needles that are substrings of each other."""
    from olist_lakehouse_2_0_spark.operators.text import multi_pattern_hits

    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet").select(
        "doc_id", "text"
    )
    sample = {
        r.doc_id: r.text for r in docs.filter(F.col("doc_id") < 40).collect()
    }
    some_text = next(t for t in sample.values() if len(t) > 60)
    needles = {
        1: some_text[10:35],          # planted: must hit its source
        2: "query",                   # frequent token
        3: "que",                     # prefix of needle 2 (overlap case)
        4: "zzz-never-present-zzz",   # must hit nothing
    }
    got = {
        (r.doc_id, r.needle_id)
        for r in multi_pattern_hits(docs, needles).collect()
    }
    want = set()
    for r in docs.collect():
        for nid, pat in needles.items():
            if r.text and pat in r.text:
                want.add((r.doc_id, nid))
    assert got == want
    assert any(nid == 1 for _, nid in got)
    assert not any(nid == 4 for _, nid in got)


def test_word_window_udtf_matches_jvm_chunking(spark, sf_correctness):
    """The Python UDTF expansion must produce exactly the chunks of the
    JVM token_chunks path at the same window/stride (stride == window:
    non-overlapping), including zero rows for empty documents."""
    from olist_lakehouse_2_0_spark.operators.text import (
        token_chunks,
        word_window_udtf,
    )

    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet").select(
        "doc_id", "text"
    )
    spark.udtf.register("word_windows_test", word_window_udtf())
    docs.createOrReplaceTempView("__docs_udtf_test")
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk)
        for r in spark.sql(
            "SELECT d.doc_id, w.chunk_id, w.chunk"
            " FROM __docs_udtf_test d, LATERAL word_windows_test(d.text, 16) w"
        ).collect()
    )
    jvm = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.posexplode(token_chunks("text", window=16, stride=16)).alias(
                "chunk_id", "toks"
            ),
        )
        .select("doc_id", "chunk_id", F.array_join("toks", " ").alias("chunk"))
    )
    expected = sorted((r.doc_id, r.chunk_id, r.chunk) for r in jvm.collect())
    assert got == expected and len(got) > 0


def test_heavy_hitter_tokens_exact_on_skewed_long_tail(spark):
    """The Misra-Gries candidate pass must survive its worst case: a
    few true heavy hitters buried in a long tail of singletons that
    constantly evict counters. The result must EQUAL the exact
    group-by relation — count and threshold boundary included."""
    from collections import Counter

    from olist_lakehouse_2_0_spark.operators.text import heavy_hitter_tokens

    # 3000 singleton tokens + 'hot' at ~20% + 'warm' just above n/32
    # + 'cool' just below it, scattered across 16 partitions.
    words = [f"rare{i}" for i in range(3000)]
    n_pad = len(words)
    docs = []
    for i in range(300):
        chunk = words[i * 10 : (i + 1) * 10]
        docs.append(" ".join(chunk + ["hot"] * 3))
    total_so_far = n_pad + 900
    # choose counts so warm > n/32 >= cool with n = total + warm + cool
    warm, cool = 140, 120  # n = 4160 -> n/32 = 130
    docs.append(" ".join(["warm"] * warm))
    docs.append(" ".join(["cool"] * cool))
    df = spark.createDataFrame(
        [(t,) for t in docs], "text string"
    ).repartition(16)

    got = {
        r.token: r.n_occurrences
        for r in heavy_hitter_tokens(df, "text", threshold_k=32).collect()
    }
    exact = Counter(" ".join(docs).split())
    n = sum(exact.values())
    expected = {t: c for t, c in exact.items() if c * 32 > n}
    assert got == expected
    assert "hot" in got and "warm" in got and "cool" not in got
    assert total_so_far + warm + cool == n


#: Whitespace-edge corpus: leading tab/newline (JVM trim keeps them ->
#: a leading '' token), trailing newline ('' trailing token), U+00A0
#: (NOT a separator for Java/RE2 \s, but IS for Python's Unicode
#: split), and plain-space controls.
_WS_EDGE_DOCS = [
    "\tfoo bar",
    "\nfoo baz",
    "foo\tbar\n",
    "a b c",
    " foo bar ",
    "foo",
    "",
    "  ",
    "\t",
]


def test_jvm_tokens_python_mirror_matches_jvm_exactly(spark):
    """jvm_tokens (the Python mirror used by the Misra-Gries candidate
    pass and the word-window UDTF) must agree token-for-token with the
    JVM tokens() column on every whitespace edge — leading/trailing
    tab and newline, U+00A0, space-only strings (round-5 advice: the
    Unicode-aware str.strip()/str.split() versions silently diverged)."""
    from olist_lakehouse_2_0_spark.operators.text import jvm_tokens, tokens

    df = spark.createDataFrame([(t,) for t in _WS_EDGE_DOCS], "text string")
    jvm = [r.toks for r in df.select(tokens("text").alias("toks")).collect()]
    py = [jvm_tokens(t) for t in _WS_EDGE_DOCS]
    assert py == jvm
    # The edges genuinely exercise empty-token retention:
    assert jvm_tokens("\tfoo bar") == ["", "foo", "bar"]
    assert jvm_tokens("foo\tbar\n") == ["foo", "bar", ""]
    assert jvm_tokens("a b c") == ["a b", "c"]
    assert jvm_tokens("\t") == ["", ""]
    assert jvm_tokens("  ") == []


def test_heavy_hitter_tokens_exact_on_whitespace_edges(spark):
    """Heavy hitters over a corpus whose texts start/end with non-space
    whitespace: the candidate pass must see the SAME token stream as
    the JVM verify pass (including leading-'' tokens), or a heavy
    hitter hides from the sketch and the superset guarantee breaks."""
    from olist_lakehouse_2_0_spark.operators.text import (
        heavy_hitter_tokens,
        jvm_tokens,
    )
    from collections import Counter

    # '' occurs once per doc (leading tab) and 'hh' dominates — both
    # must surface; U+00A0-joined 'a\xa0b' is ONE token.
    docs = ["\thh hh a b a b"] * 6 + ["\nx" + str(i) for i in range(4)]
    df = spark.createDataFrame([(t,) for t in docs], "text string").repartition(4)
    got = {
        r.token: r.n_occurrences
        for r in heavy_hitter_tokens(df, "text", threshold_k=4).collect()
    }
    exact = Counter(t for d in docs for t in jvm_tokens(d))
    n = sum(exact.values())
    expected = {t: c for t, c in exact.items() if c * 4 > n}
    assert "" in expected  # the edge is actually exercised
    assert "a b" in expected
    assert got == expected


def test_word_window_udtf_matches_jvm_on_whitespace_edges(spark):
    """The UDTF expansion must equal the JVM token_chunks path on
    whitespace-edge documents (leading tab -> leading '' token shifts
    every window boundary; U+00A0 must not split)."""
    from olist_lakehouse_2_0_spark.operators.text import (
        token_chunks,
        word_window_udtf,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_WS_EDGE_DOCS)], "doc_id int, text string"
    )
    spark.udtf.register("word_windows_ws_edge", word_window_udtf())
    df.createOrReplaceTempView("__docs_ws_edge")
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk, r.n_tokens)
        for r in spark.sql(
            "SELECT d.doc_id, w.chunk_id, w.chunk, w.n_tokens"
            " FROM __docs_ws_edge d, LATERAL word_windows_ws_edge(d.text, 2) w"
        ).collect()
    )
    jvm = (
        df.filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.posexplode(token_chunks("text", window=2, stride=2)).alias(
                "chunk_id", "toks"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.array_join("toks", " ").alias("chunk"),
            F.size("toks").alias("n_tokens"),
        )
    )
    expected = sorted(
        (r.doc_id, r.chunk_id, r.chunk, r.n_tokens) for r in jvm.collect()
    )
    assert got == expected and len(got) > 0


def test_train_quality_model_recovers_teacher_and_plugs_into_scorer(
    spark, sf_correctness
):
    """The classifier loop end to end: label the corpus with the FIXED
    teacher weights (score > 0.5), train a fresh logistic regression
    DISTRIBUTED over the same JVM features, and verify (a) the learned
    model reproduces the teacher's labels almost perfectly and (b) the
    learned weights plug straight into the Arrow-batched scoring UDF."""
    from olist_lakehouse_2_0_spark.operators.text import (
        EN_STOPWORDS,
        model_quality_score,
        tokens,
        train_quality_model,
    )

    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet")
    toks = tokens("text")
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    feats = (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            F.size(
                F.filter(toks, lambda t: F.array_contains(stop_arr, t))
            ).alias("n_stop"),
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
            ).alias("char_mass"),
        )
        .filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            (F.col("n_distinct") / F.col("n_tokens")).alias("distinct_ratio"),
            (F.col("n_stop") / F.col("n_tokens")).alias("stop_frac"),
            (F.col("char_mass") / F.col("n_tokens")).alias("mean_tok_len"),
            F.log1p("n_tokens").alias("log1p_tokens"),
        )
    )
    teacher = model_quality_score(
        F.col("distinct_ratio"),
        F.col("stop_frac"),
        F.col("mean_tok_len"),
        F.col("log1p_tokens"),
    )
    # Split at the corpus median teacher score so both classes exist
    # (the whole corpus clears the 0.5 sigmoid on this teacher).
    scored_t = feats.withColumn("t_score", teacher)
    median = scored_t.agg(
        F.expr("percentile_approx(t_score, 0.5)").alias("m")
    ).first()["m"]
    labeled = scored_t.withColumn(
        "label", (F.col("t_score") > median).cast("double")
    ).cache()
    n_pos = labeled.filter("label = 1.0").count()
    n = labeled.count()
    assert 0 < n_pos < n, "teacher labels must be non-degenerate"

    weights, bias = train_quality_model(
        labeled,
        ("distinct_ratio", "stop_frac", "mean_tok_len", "log1p_tokens"),
        "label",
    )
    student = model_quality_score(
        F.col("distinct_ratio"),
        F.col("stop_frac"),
        F.col("mean_tok_len"),
        F.col("log1p_tokens"),
        weights=weights,
        bias=bias,
    )
    scored = labeled.withColumn(
        "pred", (student > 500_000).cast("double")
    )
    acc = scored.filter("pred = label").count() / n
    labeled.unpersist()
    assert acc >= 0.97, f"learned model accuracy {acc} on {n} docs"
