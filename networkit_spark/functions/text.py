"""Text-analysis functions for large-scale training-data pipelines.

All of these are pure JVM-side column expressions (no Python UDFs) so they
stay inside whole-stage codegen and vectorize at 100 TB. Each has an exact
DuckDB-SQL twin used by the correctness oracles (same split/md5/length
primitives exist in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Small fixed stopword lists (per language) for the n-gram/stopword heuristic
# language classifier. Deliberately tiny + frozen: the classifier must be a
# deterministic pure function of the text.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "es": ["el", "la", "los", "las", "y", "es", "que", "de", "un", "con"],
    "fr": ["le", "la", "les", "et", "est", "que", "pour", "dans", "un", "une"],
}


def tokens(col) -> Column:
    """Whitespace tokenization (single-space convention of the corpus)."""
    return F.split(F.col(col) if isinstance(col, str) else col, " ")


def token_count(col) -> Column:
    return F.size(tokens(col))


def char_count(col) -> Column:
    return F.length(F.col(col) if isinstance(col, str) else col)


def stopword_count(col, lang: str = "en") -> Column:
    lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(lst, t)))


def alpha_ratio(col) -> Column:
    """Fraction of characters that are ASCII lowercase letters or space."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, "[^a-z ]", "")) / F.length(c)


def quality_score(col, lang: str = "en") -> Column:
    """Composite quality heuristic in [0, ~1]: length band + stopword density
    + alphabetic purity. Mirrors the shape of C4/Gopher-style quality rules;
    fully SQL-expressible."""
    n_tok = token_count(col).cast("double")
    sw = stopword_count(col, lang).cast("double")
    length_ok = F.when((n_tok >= 5) & (n_tok <= 10000), 1.0).otherwise(0.0)
    return F.round(
        0.4 * length_ok + 0.3 * F.least(sw / n_tok * 5.0, F.lit(1.0)) + 0.3 * alpha_ratio(col),
        6,
    )


def language_id(col) -> Column:
    """Stopword-hit language classifier over the fixed lists; argmax hits,
    ties broken by language code order; 'und' when no hits."""
    c = F.col(col) if isinstance(col, str) else col
    scores = []
    for lang in sorted(STOPWORDS):
        lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(F.split(c, " "), lambda t: F.array_contains(lst, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    arr = F.array(*scores)
    # argmax hits; ties break to the smallest language code
    max_hits = F.array_max(F.transform(arr, lambda s: s["hits"]))
    winners = F.filter(arr, lambda s: s["hits"] == max_hits)
    first = F.array_min(F.transform(winners, lambda s: s["lang"]))
    return F.when(max_hits > 0, first).otherwise(F.lit("und"))


def fingerprint64(col) -> Column:
    """Deterministic 60-bit document fingerprint: first 15 hex chars of
    md5(text) as BIGINT — identical value in DuckDB via
    ('0x' || substr(md5(x),1,15))::BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def fingerprint64_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def analyze_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass text profile: (id, n_chars, n_tokens, stopword_en, alpha,
    quality, lang_pred, fp64)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        char_count(c).cast("long").alias("n_chars"),
        token_count(c).cast("long").alias("n_tokens"),
        stopword_count(c, "en").cast("long").alias("stopwords_en"),
        F.round(alpha_ratio(c), 6).alias("alpha_ratio"),
        quality_score(c).alias("quality"),
        language_id(c).alias("lang_pred"),
        fingerprint64(c).alias("fp64"),
    )
