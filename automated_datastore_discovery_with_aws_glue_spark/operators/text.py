"""Text-analysis operators for LLM-data pipelines (north-star surface,
`BASELINE.json`): token counting, quality scoring, language ID,
document fingerprinting.

All pure JVM-side expressions (split / filter / aggregate higher-order
functions) — no Python UDFs, so every operator rides whole-stage codegen
and scales linearly with executors. Patterns and word lists are shared
verbatim with the DuckDB oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: language -> high-frequency stopwords (tiny embedded lists; the n-gram
#: heuristic just needs relative evidence, not full dictionaries)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "los", "una"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "fr": ("le", "les", "des", "et", "une", "dans", "est", "pour"),
}

_WS = r"\s+"


def normalize_text(col: Column) -> Column:
    """Canonical form for hashing/dedup: lowercase, collapse whitespace,
    trim."""
    return F.trim(F.regexp_replace(F.lower(col), _WS, " "))


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    return F.when(normalize_text(col) == "", 0).otherwise(F.size(tokens(col)))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text
    (exact-dedup key; same function exists in DuckDB for the oracle)."""
    return F.md5(normalize_text(col).cast("binary"))


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    vocab = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(vocab, t)))


def lang_scores(col: Column) -> dict[str, Column]:
    toks = tokens(col)
    return {lang: _stopword_hits(toks, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(col: Column) -> Column:
    """Argmax language with the fixed priority en > es > de > fr on ties
    (deterministic across engines)."""
    s = lang_scores(col)
    return (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]), "en")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]), "es")
        .when(s["de"] >= s["fr"], "de")
        .otherwise("fr")
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: token count, average token length,
    stopword ratio, punctuation ratio, and a composite quality score in
    [0, 1] (heuristic: enough tokens, prose-like stopword density, low
    punctuation noise)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tokens = token_count(c)
    n_chars = F.length(c)
    sw = _stopword_hits(toks, LANG_STOPWORDS["en"])
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    stopword_ratio = F.round(sw / F.greatest(n_tokens, F.lit(1)), 4)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    avg_token_len = F.round(
        F.length(F.regexp_replace(normalize_text(c), " ", "")) / F.greatest(n_tokens, F.lit(1)),
        4,
    )
    quality = F.round(
        F.least(n_tokens / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.least(stopword_ratio * 5, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2,
        4,
    )
    return df.select(
        "*",
        n_chars.alias("stat_n_chars"),
        n_tokens.alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        stopword_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality_score"),
    )
