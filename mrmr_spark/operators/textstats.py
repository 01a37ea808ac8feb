"""Text-analysis column builders: token counting, quality scoring,
language-ID heuristic, document fingerprinting. All pure JVM column
expressions (codegen) — reusable in the FE pipeline and the gate queries.

``split`` selects the tokenizer regex (default any-whitespace); the gate
queries pass a literal space so the DuckDB oracle can reproduce the
tokenization exactly (string_split has no \\s+ trailing-strip twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]
ES_STOPWORDS = ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"]

DEFAULT_SPLIT = r"\s+"


def _tok(text_col: str, split: str = DEFAULT_SPLIT) -> Column:
    return F.split(F.col(text_col), split)


def token_count(text_col: str = "text", split: str = DEFAULT_SPLIT) -> Column:
    return F.size(_tok(text_col, split))


def distinct_token_count(text_col: str = "text", split: str = DEFAULT_SPLIT) -> Column:
    return F.size(F.array_distinct(_tok(text_col, split)))


def type_token_ratio(text_col: str = "text", split: str = DEFAULT_SPLIT) -> Column:
    return distinct_token_count(text_col, split) / token_count(text_col, split).cast("double")


def stopword_hits(
    text_col: str = "text",
    stopwords: list[str] | None = None,
    split: str = DEFAULT_SPLIT,
) -> Column:
    # pure Column functions (no string-built F.expr: a quote in the column
    # name, pattern, or a stopword must not be able to break the SQL parse)
    words = [w.lower() for w in (stopwords or EN_STOPWORDS)]
    return F.size(F.filter(_tok(text_col, split), lambda t: F.lower(t).isin(words)))


def punct_ratio(text_col: str = "text") -> Column:
    stripped = F.regexp_replace(F.col(text_col), r"[^\p{Punct}]", "")
    return F.length(stripped) / F.greatest(F.length(text_col), F.lit(1)).cast("double")


def quality_score(text_col: str = "text", split: str = DEFAULT_SPLIT) -> Column:
    """Heuristic document-quality score in [0,1]: rewards mid-length docs,
    lexical diversity and low punctuation density (the usual pretraining
    data-quality features, re-expressed as one codegen expression)."""
    n_tok = token_count(text_col, split).cast("double")
    length_term = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    ttr = type_token_ratio(text_col, split)
    punct = punct_ratio(text_col)
    score = length_term * (F.lit(0.5) + F.lit(0.5) * ttr) * (F.lit(1.0) - F.least(punct * 4, F.lit(1.0)))
    return F.round(F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)), 6)


def lang_id(text_col: str = "text", split: str = DEFAULT_SPLIT) -> Column:
    """Stopword-vote language heuristic (en/es/de/other), deterministic
    tie-break by language order."""
    en = stopword_hits(text_col, EN_STOPWORDS, split)
    es = stopword_hits(text_col, ES_STOPWORDS, split)
    de = stopword_hits(text_col, DE_STOPWORDS, split)
    best = F.greatest(en, es, de)
    return (
        F.when(best == 0, "other")
        .when(en == best, "en")
        .when(es == best, "es")
        .otherwise("de")
    )


def fingerprint64(text_col: str = "text", normalize: bool = True) -> Column:
    """64-bit document fingerprint: xxhash64 of the normalized text
    (lowercase, collapsed whitespace) — the exact-dedup key at scale."""
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.trim(F.regexp_replace(t, r"\s+", " ")))
    return F.xxhash64(t)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        df.withColumn("n_tokens", token_count(text_col).cast("bigint"))
        .withColumn("n_chars", F.length(text_col).cast("bigint"))
        .withColumn("ttr", F.round(type_token_ratio(text_col), 6))
        .withColumn("quality", quality_score(text_col))
        .withColumn("lang_pred", lang_id(text_col))
        .withColumn("fingerprint", fingerprint64(text_col))
    )
