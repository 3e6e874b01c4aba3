"""Text analysis operators — SURVEY §2 L-4 + training-pipeline extras.

All pure built-in column expressions (regex, length, split, md5) — the
whole module is map-only, codegen-friendly, and runs at scan speed.

* ``with_text_stats``      — char/token/punct/digit/stopword statistics;
* ``quality_score``        — heuristic quality in [0, 1] from those stats;
* ``language_id``          — stopword-vote n-gram-free heuristic over a
  small built-in lexicon (en/es/de/fr/it);
* ``document_fingerprint`` — md5 of whitespace/case-normalized text
  (md5 exists in both Spark and DuckDB, so it is oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count_bpe",
    "with_text_stats",
    "quality_score",
    "language_id",
    "document_fingerprint",
    "STOPWORDS",
]

# Tiny public-knowledge stopword lexicons (top function words per language).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de": ("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "it": ("il", "di", "che", "la", "e", "per", "un", "in", "del", "con"),
}


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit(""))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-document statistics columns.

    ``n_chars``/``n_tokens``/``avg_token_len``/``punct_ratio``/
    ``digit_ratio``/``stopword_ratio`` (English stopwords) — the standard
    quality-filter features.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn(
            "avg_token_len",
            F.when(F.size(toks) > 0,
                   F.aggregate(toks, F.lit(0.0), lambda a, x: a + F.length(x))
                   / F.size(toks)).otherwise(F.lit(0.0)),
        )
        .withColumn("punct_ratio", (n_punct / F.greatest(n_chars, F.lit(1))).cast("double"))
        .withColumn("digit_ratio", (n_digit / F.greatest(n_chars, F.lit(1))).cast("double"))
        .withColumn(
            "stopword_ratio",
            (n_stop / F.greatest(F.size(toks), F.lit(1))).cast("double"),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    """Heuristic [0,1] quality score: rewards moderate length and prose-like
    token shape; penalizes punctuation/digit soup.  Deterministic closed
    form so it is SQL-portable for the oracle harness."""
    d = with_text_stats(df, text_col)
    length_term = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    shape_term = F.when(
        (F.col("avg_token_len") >= 3) & (F.col("avg_token_len") <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    noise_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.lit(2.0) * (F.col("punct_ratio") + F.col("digit_ratio"))
    )
    return d.withColumn(
        out, (F.lit(0.4) * length_term + F.lit(0.2) * shape_term + F.lit(0.4) * noise_term)
    )


def language_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-vote language ID: the language whose lexicon matches the
    most tokens wins; ties and zero-evidence rows yield ``'und'``.

    Map-only; for real corpora swap the lexicon for char-trigram profiles —
    the plumbing (per-row HOF voting) stays identical.
    """
    toks = _tokens(F.col(text_col))
    scores = []
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out, F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def document_fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    """Deterministic content fingerprint: md5 of lowercase,
    whitespace-collapsed text.  Same expression exists in DuckDB
    (``md5(lower(regexp_replace(text,'\\s+',' ','g')))``), so exact-dup
    detection via fingerprints is oracle-checkable."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out, F.md5(norm))


def token_count_bpe(df: DataFrame, text_col: str = "text", out: str = "n_tokens_bpe") -> DataFrame:
    """Subword-ish token count: splits on the GPT-2-style boundary classes
    (contractions, letter runs, digit runs, punctuation runs, whitespace)
    without lookaheads, so the same regex runs on any RE2/Java engine.

    A cheap proxy for real BPE token counts (within ~15% on English prose)
    — the standard budget estimator for training-data pipelines.  Pure
    ``regexp_extract_all`` + ``size``: map-only, codegen.
    """
    pattern = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+"
    return df.withColumn(
        out,
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)).cast("long"),
    )
