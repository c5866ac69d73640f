"""Text-analysis operators for training-data pipelines over a documents table:
language ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting. All JVM-side expressions (whole-stage codegen) —
these run once per document at corpus scale, so no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_identity_resolution_spark.functions.normalize import normalize_text

# minimal stopword profiles for the n-gram/stopword-hit language heuristic
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "dans", "que"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "una", "es"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty after normalization)."""
    norm = normalize_text(text)
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(F.size(F.split(norm, " ")))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count word pieces after splitting on whitespace
    AND within-word transitions (letters/digits/other), ~the granularity a BPE
    tokenizer would not go below. Pure regexp — one pass."""
    pieces = F.regexp_replace(
        F.coalesce(text, F.lit("")), r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+)", "$1 "
    )
    trimmed = F.trim(F.regexp_replace(pieces, r"\s+", " "))
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(F.split(trimmed, " ")))


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features + composite score ∈ [0,1]:
    length band, alpha ratio, stopword ratio, mean word length, repetition
    (distinct/total tokens). The standard pre-training quality gates
    (Gopher/C4-style rules) as one declarative projection."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    norm = normalize_text(t)
    words = F.split(norm, " ")
    n_tok = F.when(F.length(norm) == 0, F.lit(0)).otherwise(F.size(words))
    n_chars = F.length(t)
    alpha_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(t, r"[^a-zA-Z]", "")).cast("double") / n_chars
    )
    sw = F.array(*[F.lit(w) for w in _LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    stop_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(stop_hits.cast("double") / n_tok)
    distinct_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(words)).cast("double") / n_tok
    )
    mean_word_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(norm, " ", "")).cast("double") / n_tok
    )
    len_ok = (n_tok >= 5) & (n_tok <= 100_000)
    score = F.round(
        F.when(~len_ok, 0.0).otherwise(
            0.3 * F.least(F.lit(1.0), alpha_ratio * 1.25)
            + 0.2 * F.least(F.lit(1.0), stop_ratio * 5.0)
            + 0.3 * distinct_ratio
            + 0.2 * F.when((mean_word_len >= 3) & (mean_word_len <= 10), 1.0).otherwise(0.3)
        ),
        4,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_token_ratio"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        score.alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: per language, count profile hits in the
    token set; argmax wins (ties break to the lexicographically LARGEST
    language code — array_max on (hits, lang) structs; no hits → 'und').
    One projection, no shuffle, no UDF."""
    norm = normalize_text(F.col(text_col))
    words = F.array_distinct(F.split(norm, " "))
    hit_cols = []
    for lang, stops in sorted(_LANG_STOPWORDS.items()):
        sw = F.array(*[F.lit(w) for w in stops])
        hit_cols.append(
            F.struct(
                F.size(F.filter(words, lambda w: F.array_contains(sw, w))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*hit_cols))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].alias("stopword_hits"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 + first-64-chars prefix hash of normalized
    text (the cheap rolling-hash family used for bucketing/shard-stable IDs)."""
    norm = normalize_text(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("content_md5"),
        F.md5(F.substring(norm, 1, 64)).alias("prefix64_md5"),
        F.crc32(norm).alias("content_crc32"),
    )
