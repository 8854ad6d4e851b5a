"""Text analysis operators for training-data pipelines.

All expressions are JVM-side built-ins (regexp/array functions) — no Python
UDFs — so they stay inside whole-stage codegen and scan 100 TB at parquet
speed. Regex literals are kept to the syntax subset shared by Java regex
(Spark) and RE2 (DuckDB) so the oracle recomputes them identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit language
# heuristic. Deliberately small + deterministic; a real deployment would
# plug in fastText or CLD3 via a pandas UDF (see multimodal.py for the
# UDF plumbing pattern).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"),
}

PUNCT_CLASS = r"[.,;:!?]"
STOPWORDS = LANG_MARKERS["en"]


def tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(tokens(text)))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_count(text: Column) -> Column:
    return F.size(F.split(text, PUNCT_CLASS)) - 1


def stopword_count(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stopwords)))


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc quality features: counts + ratios (length, punctuation,
    stopwords, mean token length)."""
    t = F.col(text_col)
    tc = token_count(t)
    return df.select(
        F.col(id_col).alias("doc_id"),
        char_count(t).alias("n_chars"),
        tc.alias("n_tokens"),
        punct_count(t).alias("n_punct"),
        stopword_count(t).alias("n_stopwords"),
        (punct_count(t) / F.greatest(char_count(t), F.lit(1))).alias("punct_ratio"),
        (stopword_count(t) / F.greatest(tc, F.lit(1))).alias("stopword_ratio"),
        (
            (char_count(t) - (tc - 1)) / F.greatest(tc, F.lit(1))
        ).alias("mean_token_len"),
    )


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words)))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: argmax of stopword hits, deterministic
    tie-break on language code ascending; 'und' (undetermined) when no
    marker hits at all."""
    scores = lang_scores(F.col(text_col))
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # ascending iteration + strict '>' ⇒ on ties the earlier (smaller) lang
    # code is kept — deterministic asc tie-break.
    for lang in sorted(scores):
        s = scores[lang]
        best_lang = F.when(s > best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(s, best_score)
    return df.select(
        F.col(id_col).alias("doc_id"),
        best_lang.alias("detected_lang"),
        best_score.alias("marker_hits"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Document fingerprint: md5 over the whitespace-normalized, lowercased
    text — the cheap exact-dup key for normalized content."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalized).alias("fingerprint"),
    )
