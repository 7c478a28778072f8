"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language identification, document fingerprinting.

All pure DataFrame expressions (split / higher-order functions /
aggregates) — whole-stage-codegen'd, no Python in the hot path, so they
stream over 100 TB of documents at parquet-scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "token_stats",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "LANG_STOPWORDS",
]


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics: n_tokens (whitespace), n_chars,
    n_words_bpe (BPE-ish regex: word pieces + punctuation), avg_word_len."""
    words = F.split(F.col(text_col), " ")
    bpe_ish = F.expr(
        f"size(regexp_extract_all({text_col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0))"
    )
    return df.select(
        F.col(id_col),
        F.size(words).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        bpe_ish.alias("n_pieces"),
        F.round(
            F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
            / F.greatest(F.size(words), F.lit(1)),
            6,
        ).alias("avg_word_len"),
    )


# Tiny per-language stopword lists (public, common words).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "人"],
}


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document quality in [0,1] from length, punctuation ratio
    and stopword ratio (the standard pretraining-filter trio)."""
    text = F.col(text_col)
    words = F.split(text, " ")
    n_words = F.greatest(F.size(words), F.lit(1))
    n_chars = F.greatest(F.length(text), F.lit(1))
    punct = F.expr(
        f"size(regexp_extract_all({text_col}, '[^A-Za-z0-9\\\\s]', 0))"
    )
    stop_list = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(
        F.filter(words, lambda w: F.array_contains(stop_list, F.lower(w)))
    )
    length_score = F.least(F.size(words) / F.lit(50.0), F.lit(1.0))
    punct_ratio = punct.cast("double") / n_chars
    stop_ratio = stop_hits.cast("double") / n_words
    score = (
        length_score * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    )
    return df.select(
        F.col(id_col),
        F.round(length_score, 6).alias("length_score"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """N-gram-free language ID: count stopword hits per language, take the
    argmax (ties break by language code order). Score columns included so
    downstream filters can threshold confidence."""
    words = F.transform(F.split(F.col(text_col), " "), F.lower)
    out = df.select(F.col(id_col), words.alias("__w"))
    langs = sorted(LANG_STOPWORDS)
    for lang in langs:
        stop_list = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        out = out.withColumn(
            f"score_{lang}",
            F.size(F.filter(F.col("__w"), lambda w: F.array_contains(stop_list, w))),
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):  # earlier langs win ties
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return out.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        *[F.col(f"score_{lang}") for lang in langs],
    )


def doc_fingerprint(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, sketch: int = 4
) -> DataFrame:
    """Bottom-k sketch fingerprint: the `sketch` smallest md5-derived
    hashes over k-word shingles, joined into one string. Two documents
    sharing most shingles share most of the sketch (winnowing-style)."""
    from .dedup import shingle_tokens

    postings = shingle_tokens(df, id_col, text_col, k)
    hashed = postings.select(
        "id",
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    return (
        hashed.groupBy("id")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
        .select(
            "id",
            F.concat_ws("-", F.slice("hs", 1, sketch)).alias("fingerprint"),
        )
    )
