"""Text-analysis operators for training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language-ID
heuristics, quality scoring, token counting, and document
fingerprinting over a ``documents(doc_id, text, lang, source,
n_chars)`` table.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen). Nothing here shuffles except the explicit
aggregations; per-document derivations are embarrassingly parallel and
scale linearly to 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword marker sets for the n-gram/stopword
#: language heuristic. Deliberately small: the heuristic's job is cheap
#: bulk routing, not NLP-grade detection (fasttext-style models plug in
#: behind the same column contract via a pandas UDF).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "les", "et", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "pt": ("o", "a", "de", "que", "e"),
}

EN_STOPWORDS = ("the", "a", "an", "of", "and", "or", "is", "are", "to", "in")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (empty string -> empty array)."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-approximating token count: word-piece splits on letter/digit/
    punctuation boundaries (regexp-based; ~GPT-2 pre-tokenizer shape)."""
    c = F.col(text) if isinstance(text, str) else text
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))
    return hits / F.nullif(F.size(toks), F.lit(0))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.nullif(F.length(c), F.lit(0))


def mean_token_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return total / F.nullif(F.size(toks).cast("double"), F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    + punctuation sanity (the reference's rule-based derivation style,
    e.g. sentiment silver/order_reviews.sql:41-45, generalized to
    document quality)."""
    n_tok = token_count(text)
    sw = F.coalesce(stopword_ratio(text), F.lit(0.0))
    pr = F.coalesce(punct_ratio(text), F.lit(0.0))
    length_component = (
        F.when(n_tok >= 20, 0.4)
        .when(n_tok >= 5, 0.2)
        .otherwise(0.0)
    )
    stopword_component = F.when((sw >= 0.05) & (sw <= 0.6), 0.3).otherwise(0.0)
    punct_component = F.when(pr <= 0.2, 0.3).otherwise(0.0)
    return length_component + stopword_component + punct_component


def lang_guess(text: Column | str) -> Column:
    """Marker-stopword language vote: the language with the most marker
    hits wins (ties resolve deterministically to the lexicographically
    last language — struct max ordering); no hits -> 'und'."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    entries = []
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
        entries.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*entries))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column | str) -> Column:
    """64-bit document fingerprint: xxhash64 of whitespace-normalized,
    lowercased text — the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.xxhash64(normalized)


def profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full per-document text-analysis column set."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars_measured"),
        stopword_ratio(t).alias("stopword_ratio"),
        punct_ratio(t).alias("punct_ratio"),
        mean_token_length(t).alias("mean_token_len"),
        quality_score(t).alias("quality_score"),
        lang_guess(t).alias("lang_guess"),
        fingerprint(t).alias("fingerprint"),
    )
