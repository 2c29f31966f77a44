"""Text analytics for training-data pipelines over the ``documents`` table.

Language-ID (stopword heuristic), quality scoring, token counting, document
fingerprinting.  All built from native ``pyspark.sql.functions`` so they are
whole-stage-codegen'd AND expressible as ANSI SQL for the DuckDB oracle
(same formulas in ``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword lists (public-knowledge common words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
}

TOKEN_SPLIT = "\\s+"


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), TOKEN_SPLIT)


def token_count(text: Column) -> Column:
    """Whitespace token count (empty text -> 0)."""
    return F.when(F.trim(text) == "", 0).otherwise(F.size(tokens(text)))


def stopword_hits(text: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(tokens(F.lower(text)), lambda t: F.array_contains(arr, t))
    )


def lang_id(text: Column) -> Column:
    """Argmax over per-language stopword hit counts; NULL when no hits."""
    en, de, fr = (stopword_hits(text, lang) for lang in ("en", "de", "fr"))
    best = F.greatest(en, de, fr)
    return (
        F.when(best <= 0, F.lit(None).cast("string"))
        .when(en == best, "en")  # tie-break order en > de > fr (documented)
        .when(de == best, "de")
        .otherwise("fr")
    )


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + word shape +
    punctuation density.  Pure arithmetic -> SQL-portable."""
    n_chars = F.length(text)
    n_words = token_count(text)
    avg_word = n_chars / F.greatest(n_words, F.lit(1))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_score = F.when((avg_word >= 3) & (avg_word <= 12), 1.0).otherwise(0.5)
    return F.round(0.6 * len_score + 0.4 * word_score, 4)


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 hex (identical in Spark and DuckDB)."""
    return F.md5(text)


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        docs.withColumn("n_tokens", token_count(t))
        .withColumn("detected_lang", lang_id(t))
        .withColumn("quality", quality_score(t))
        .withColumn("fingerprint", fingerprint(t))
    )
