"""Property-based invariants (hypothesis) for the round-2 operators:
range_join vs a naive Python BETWEEN scan, stratified_cap's exact-count
and determinism guarantees, and segment_dedup_stats vs a brute-force
Python segmenter — for ANY corpus/interval shape, not just the
hand-picked unit-test cases."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olist_lakehouse_2_0_spark.operators.joins import range_join
from olist_lakehouse_2_0_spark.operators.sampling import stratified_cap
from olist_lakehouse_2_0_spark.operators.text import segment_dedup_stats

# Small value domains force collisions (shared segments, hot buckets,
# adjacent intervals) far more often than uniform randomness would.
intervals_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 12)),  # (start, length)
    min_size=0,
    max_size=8,
)
points_strategy = st.lists(st.integers(-5, 55), min_size=0, max_size=30)

docs_strategy = st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),
    min_size=0,
    max_size=8,
)

groups_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.sampled_from(["x", "y", "z"])),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)


def _seg_expected(docs: list[list[str]], seg: int, min_docs: int):
    segs_by_doc = {}
    for i, toks in enumerate(docs):
        segs_by_doc[i] = [
            tuple(toks[s : s + seg]) for s in range(0, max(len(toks), 1), seg)
        ]
        segs_by_doc[i] = [s for s in segs_by_doc[i] if s]
    df_count: dict[tuple, set] = {}
    for i, segs in segs_by_doc.items():
        for s in segs:
            df_count.setdefault(s, set()).add(i)
    out = {}
    for i, segs in segs_by_doc.items():
        if not segs:
            continue
        shared = [s for s in segs if len(df_count[s]) >= min_docs]
        out[i] = (
            len(segs),
            len(shared),
            sum(len(s) for s in segs),
            sum(len(s) for s in segs if len(df_count[s]) < min_docs),
        )
    return out


@pytest.mark.usefixtures("spark")
class TestOperatorProperties:
    @given(points=points_strategy, ivs=intervals_strategy)
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_range_join_equals_naive_between(self, spark, points, ivs):
        p = spark.createDataFrame([(i, v) for i, v in enumerate(points)], "pid long, p long")
        i_rows = [(j, s, s + ln) for j, (s, ln) in enumerate(ivs)]
        iv = spark.createDataFrame(i_rows, "iid long, s long, e long")
        got = {
            (r["pid"], r["iid"])
            for r in range_join(p, iv, "p", "s", "e", bucket_width=5).collect()
        }
        expected = {
            (pid, iid)
            for pid, v in enumerate(points)
            for iid, s, e in i_rows
            if s <= v < e
        }
        assert got == expected

    @given(rows=groups_strategy, n=st.integers(1, 5))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_stratified_cap_exact_count_and_hash_order(self, spark, rows, n):
        df = spark.createDataFrame(rows, "k long, g string")
        got = [
            (r["k"], r["g"], r["cap_rank"])
            for r in stratified_cap(df, "k", "g", n).collect()
        ]
        # exact count per group
        per_group: dict[str, list] = {}
        for k, g, rk in got:
            per_group.setdefault(g, []).append((k, rk))
        sizes = {g: len([1 for kk, gg in rows if gg == g]) for g in set(g for _, g in rows)}
        for g, members in per_group.items():
            assert len(members) == min(n, sizes[g])
        # survivors are the hash-first keys (engine-portable md5 order)
        for g in sizes:
            keys = [k for k, gg in rows if gg == g]
            order = sorted(
                keys, key=lambda k: (hashlib.md5(str(k).encode()).hexdigest()[:4], k)
            )
            expect = set(order[:n])
            assert {k for k, gg, _ in got if gg == g} == expect

    @given(docs=docs_strategy)
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_segment_dedup_stats_matches_python(self, spark, docs):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_segments"],
                r["n_shared_segments"],
                r["n_tokens"],
                r["n_kept_tokens"],
            )
            for r in segment_dedup_stats(
                df, "doc_id", "text", seg_tokens=3, min_docs=2
            ).collect()
        }
        assert got == _seg_expected(docs, 3, 2)


# ---------------------------------------------------------------------------
# Codec properties (pure Python, no Spark session): the zero-dependency
# BMP/WAV codecs must roundtrip ANY array exactly — including odd widths
# (BMP 4-byte row padding), extreme int16 samples, and 1-pixel images.
# ---------------------------------------------------------------------------


class TestCodecProperties:
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=50, deadline=None)
    def test_bmp_roundtrip_any_shape(self, h, w, seed):
        import numpy as np

        from olist_lakehouse_2_0_spark.operators.multimodal import (
            decode_bmp,
            encode_bmp,
        )

        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = encode_bmp(arr)
        # documented size law: 54-byte headers + padded rows
        assert len(payload) == 54 + ((3 * w + 3) // 4) * 4 * h
        assert (decode_bmp(payload) == arr).all()

    @given(
        samples=st.lists(
            st.integers(-32768, 32767), min_size=0, max_size=64
        ),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    @settings(max_examples=50, deadline=None)
    def test_wav_roundtrip_any_samples(self, samples, rate):
        import numpy as np

        from olist_lakehouse_2_0_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        payload = encode_wav(np.array(samples, dtype=np.int16), rate)
        sr, channels, wave = decode_wav(payload)
        assert (sr, channels) == (rate, 1)
        assert wave.tolist() == samples

    @given(
        h=st.integers(1, 10),
        w=st.integers(1, 10),
        th=st.integers(1, 10),
        tw=st.integers(1, 10),
    )
    @settings(max_examples=50, deadline=None)
    def test_resize_nearest_pixel_law(self, h, w, th, tw):
        import numpy as np

        from olist_lakehouse_2_0_spark.operators.multimodal import (
            resize_nearest,
        )

        arr = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
        out = resize_nearest(arr, (tw, th))
        assert out.shape == (th, tw, 3)
        for y in range(th):
            for x in range(tw):
                assert (out[y, x] == arr[(y * h) // th, (x * w) // tw]).all()


# Corpora built from a tiny word pool force identical-text groups and
# shared shingles constantly — exactly the collisions the collapse
# machinery must be transparent to.
corpus_strategy = st.lists(
    st.lists(
        st.sampled_from(["red", "blue", "fox", "dog", "run", "sit"]),
        min_size=0,
        max_size=6,
    ),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs=corpus_strategy)
def test_collapsed_lsh_candidates_equal_naive_banding(spark, docs):
    """The identical-signature collapse + re-expansion must emit
    EXACTLY the pair set of the naive (uncollapsed) banding join, on
    ANY corpus shape — the structural claim behind the degenerate-
    corpus guard (VERDICT r4 next-step #1), checked against an
    independent plain-Python banding implementation."""
    import pyspark.sql.functions as F

    from olist_lakehouse_2_0_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string") if rows else None
    if df is None:
        return
    sigs = minhash_signatures(df, "doc_id", num_hashes=16, n=2)
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            sigs, "doc_id", bands=4, rows_per_band=4
        ).collect()
    }
    # Naive reference: band every doc's signature, pair any two docs
    # sharing a (band, bucket) — no collapse, pure Python.
    sig_rows = {r["doc_id"]: tuple(r["sig"]) for r in sigs.collect()}
    buckets: dict[tuple, set] = {}
    for doc, sig in sig_rows.items():
        for b in range(4):
            buckets.setdefault((b, sig[b * 4 : (b + 1) * 4]), set()).add(doc)
    want = {
        (a, b)
        for members in buckets.values()
        for a in members
        for b in members
        if a < b
    }
    assert got == want


def _span_removal_expected(docs: list[list[str]], k: int):
    """Plain-Python reference for remove_duplicate_spans: flag every
    k-window occurrence that is not the globally (doc, pos)-first of
    its token sequence, cut covered tokens, reassemble in order."""
    first: dict[tuple, tuple] = {}
    for i, toks in enumerate(docs):
        for p in range(0, len(toks) - k + 1):
            key = tuple(toks[p : p + k])
            if key not in first:
                first[key] = (i, p)
    out = {}
    for i, toks in enumerate(docs):
        flagged = [
            p
            for p in range(0, len(toks) - k + 1)
            if first[tuple(toks[p : p + k])] != (i, p)
        ]
        kept = [
            t
            for ti, t in enumerate(toks)
            if not any(p <= ti < p + k for p in flagged)
        ]
        out[i] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


span_docs_strategy = st.lists(
    st.lists(st.sampled_from("abc"), min_size=0, max_size=14),
    min_size=0,
    max_size=7,
)


@pytest.mark.usefixtures("spark")
class TestSpanRemovalProperties:
    @given(docs=span_docs_strategy, k=st.integers(2, 4))
    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_span_removal_equals_python_reference(self, spark, docs, k):
        """A 3-letter vocabulary makes duplicated k-grams (cross-doc
        AND intra-doc, overlapping and nested) near-certain; the Spark
        result must equal the reference on every generated corpus."""
        from olist_lakehouse_2_0_spark.operators.text import (
            remove_duplicate_spans,
        )

        df = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs)],
            "id long, text string",
        )
        got = {
            r.id: (r.orig_tokens, r.removed_tokens, r.clean_text)
            for r in remove_duplicate_spans(df, "id", "text", k=k).collect()
        }
        assert got == _span_removal_expected(docs, k)
