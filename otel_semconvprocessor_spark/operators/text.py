"""Text-analysis operators for training-data pipelines over the ``documents``
table: token counting, quality scoring, language-ID heuristic, shingling and
MinHash fingerprints.

All pure Column expressions (JVM-side, codegen-fused) — these run per-row over
10^12 documents, so no Python in the hot path.  Cross-engine reproducibility:
hashes are md5-based (identical hex in Spark and DuckDB), so every operator
here is DuckDB-oracle checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "ws_tokens",
    "ws_token_count",
    "regex_token_count",
    "stopword_ratio",
    "mean_token_len",
    "quality_features",
    "lang_id",
    "word_shingles",
    "minhash_signature",
    "doc_fingerprint",
    "STOPWORDS",
    "LANG_MARKERS",
]

# a small, fixed stopword inventory (order matters only for docs)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# marker words per language for the n-gram/stopword-hit language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "a", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "que", "los", "es"],
    "zh": ["的", "是", "了", "在", "我"],
}


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokens; empty/blank text -> empty array (Go Fields-like)."""
    t = F.trim(_as_col(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def ws_token_count(text: Column | str) -> Column:
    return F.size(ws_tokens(text))


def regex_token_count(text: Column | str) -> Column:
    """BPE-ish pre-tokenizer count: letter runs, digit runs, single
    punctuation marks — the usual GPT-2-style split shape."""
    return F.size(
        F.regexp_extract_all(_as_col(text), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    words = ws_tokens(text)
    sw = stopwords or STOPWORDS
    hits = F.size(F.filter(words, lambda w: w.isin(sw)))
    n = F.size(words)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def mean_token_len(text: Column | str) -> Column:
    words = ws_tokens(text)
    n = F.size(words)
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    t = _as_col(text)
    n = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def quality_features(text: Column | str) -> Column:
    """Quality-scoring struct: the usual pretraining heuristics."""
    t = _as_col(text)
    return F.struct(
        F.length(t).alias("n_chars"),
        ws_token_count(t).alias("n_tokens"),
        stopword_ratio(t).alias("stopword_ratio"),
        mean_token_len(t).alias("mean_token_len"),
        punct_ratio(t).alias("punct_ratio"),
    )


def lang_id(text: Column | str, markers: dict[str, list[str]] | None = None) -> Column:
    """Stopword-hit language heuristic: argmax of per-language marker counts;
    deterministic tie-break by the fixed language order; no hits -> 'und'."""
    words = ws_tokens(text)
    markers = markers or LANG_MARKERS

    # NB: bind the marker list via a factory, NOT a lambda default argument —
    # pyspark treats a 2-arg lambda in F.filter as (element, index) and would
    # silently pass the index column as `ms`.
    def marker_hits(ms: list[str]) -> Column:
        return F.size(F.filter(words, lambda w: w.isin(ms)))

    scores = {lang: marker_hits(ms) for lang, ms in markers.items()}
    best = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    expr = F.lit("und")
    # reversed so the FIRST language in dict order wins ties
    for lang in reversed(list(markers)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles: ['a b c', 'b c d', ...]; < k words -> whole text
    as the single shingle (so short docs still fingerprint)."""
    words = ws_tokens(text)
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(words, i + j) for j in range(k)]
        ),
    )
    return F.when(n >= k, grams).otherwise(F.array(F.trim(_as_col(text))))


def minhash_signature(shingles: Column, num_hashes: int = 8) -> Column:
    """MinHash signature as an array of lexicographic-min md5 hex digests,
    one per salted hash family.  Lexicographic min over a uniform hash is a
    valid min-wise permutation, and md5 hex compares identically in Spark,
    DuckDB and Python — cross-engine reproducible by construction.
    Empty shingle set -> NULL components."""

    def salted_min(salt: str) -> Column:
        # factory-bound salt (see lang_id note: no default-arg lambdas here)
        return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(s, F.lit(salt)))))

    return F.array(*[salted_min(f"#{i}") for i in range(num_hashes)])


def doc_fingerprint(text: Column | str, k: int = 3) -> Column:
    """Single-value document fingerprint: min-hash of the shingle set (the
    1-permutation case of minhash_signature) — equal fingerprints <=> very
    likely near-identical shingle streams."""
    return F.array_min(F.transform(word_shingles(text, k), F.md5))
