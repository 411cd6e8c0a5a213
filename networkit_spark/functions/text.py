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


BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
"""GPT-2-style pre-tokenizer classes (contraction pieces, letter runs, digit
runs, punctuation runs) WITHOUT the lookahead clauses — RE2 engines (DuckDB)
have no lookahead, and dropping it keeps the count identical across Java
regex and RE2 so the oracle can replicate it."""


def bpe_token_count(col) -> Column:
    """BPE-ish subword-boundary token count: number of BPE_ISH_PATTERN
    matches. Whole-stage-codegen (regexp_count); approximates a BPE
    tokenizer's pre-tokenization granularity for budget estimation without
    shipping a merges table."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def kgram_hashes(col, k: int = 5) -> Column:
    """POSITIONAL (non-distinct) character k-gram 60-bit md5 hashes —
    array<long>, one per window start; empty array below k chars. The
    rolling-hash analog: md5 replaces Rabin-Karp's incremental polynomial
    (same positional output, portable across engines; Spark evaluates the
    k-gram substrings vectorized, the asymptotics stay O(len))."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c) - F.lit(k - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.conv(F.substring(F.md5(c.substr(i, F.lit(k))), 1, 15), 16, 10).cast(
                "long"
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))


def winnow_fingerprints(col, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD'03 'local algorithms for document fingerprinting', the MOSS
    scheme): take the min k-gram hash in every window of ``w`` consecutive
    positions, distinct, sorted — array<long>. Guarantees every exact match
    of length >= w+k-1 shares a fingerprint, with expected density 2/(w+1).
    Integer-exact and engine-portable (md5-based hashes, min, distinct)."""
    hashes = kgram_hashes(col, k)
    n_win = F.size(hashes) - F.lit(w - 1)
    return F.when(
        n_win >= 1,
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_win),
                    lambda i: F.array_min(F.slice(hashes, i, w)),
                )
            )
        ),
    ).otherwise(F.array().cast("array<long>"))


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

# ---------------------------------------------------------------------------
# Repetition / quality-filter suite (Gopher-style rules)
# ---------------------------------------------------------------------------

def word_ngrams(col, n: int) -> Column:
    """Array of word n-grams (space-joined) — pure JVM higher-order functions.

    Mirrors the shape of the reference corpus tooling's n-gram shingling
    (see functions/dedup.py) but returns the grams in document order so the
    positional slice is reusable for repetition metrics and chunking."""
    toks = tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_ngram: int = 2
) -> DataFrame:
    """Gopher-style repetition metrics per document (Rae et al. 2021, §A1.1,
    "repetitious text" rules), used to filter low-quality web text at corpus
    scale:

      dup_line_frac   fraction of newline-separated lines that are duplicates
      dup_token_frac  fraction of whitespace tokens that are duplicates
      top2gram_frac   fraction of tokens covered by the single most frequent
                      word 2-gram (top_ngram=2 by default)
      mean_word_len   mean token length
      symbol_ratio    non-alphanumeric-non-space chars / chars

    Physical plan: the line/token metrics are whole-stage-codegen column
    expressions (one scan, no shuffle). The top-n-gram frequency uses
    explode + (id, gram) partial-agg + per-id max — one hash shuffle keyed by
    (id, gram), scale-safe and skew-free (gram strings are near-unique).
    """
    c = F.col(text_col)
    toks = tokens(text_col)
    lines = F.split(c, "\n")
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines), 6
        ).alias("dup_line_frac"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks), 6
        ).alias("dup_token_frac"),
        F.round(
            F.length(F.regexp_replace(c, "[a-zA-Z0-9 ]", "")) / F.length(c), 6
        ).alias("symbol_ratio"),
        F.round(
            (F.length(c) - F.size(toks) + 1) / F.size(toks), 6
        ).alias("mean_word_len"),
        word_ngrams(text_col, top_ngram).alias("_grams"),
    )
    grams = base.select(id_col, F.explode("_grams").alias("gram"))
    top = (
        grams.groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("top_cnt"))
    )
    return (
        base.drop("_grams")
        .join(top, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "dup_line_frac",
            "dup_token_frac",
            F.round(
                F.coalesce(F.col("top_cnt"), F.lit(0)) * top_ngram / F.col("n_tokens"), 6
            ).alias("top2gram_frac"),
            "mean_word_len",
            "symbol_ratio",
        )
    )


def gopher_keep(profile: DataFrame) -> DataFrame:
    """Boolean keep flag from a repetition_profile: the Gopher repetition
    thresholds (dup_line_frac <= 0.30, dup_token_frac <= 0.50 [stands in for
    Gopher's dup 5-gram char fraction on this single-line corpus],
    top2gram_frac <= 0.20 relaxed to 0.60 for short synthetic docs,
    mean_word_len in [1, 12], symbol_ratio <= 0.10)."""
    return profile.select(
        "*",
        (
            (F.col("dup_line_frac") <= 0.30)
            & (F.col("dup_token_frac") <= 0.50)
            & (F.col("top2gram_frac") <= 0.60)
            & (F.col("mean_word_len") >= 1.0)
            & (F.col("mean_word_len") <= 12.0)
            & (F.col("symbol_ratio") <= 0.10)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Train/test decontamination: n-gram collision join
# ---------------------------------------------------------------------------

def ngram_contamination(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Train-set decontamination against an eval/test probe set: flags every
    training document sharing at least one word ``n``-gram with any probe
    (the standard 13-gram collision rule from GPT-3 appendix C / PaLM).

    Returns (doc_id, n_hits, n_probes) per CONTAMINATED document — n_hits =
    distinct (gram, probe) collisions, n_probes = distinct probes hit.

    Physical plan: probes are the small side — their distinct grams are
    broadcast; the train side streams through explode + broadcast hash join,
    then one partial-agg shuffle keyed by doc_id. No shuffle of the corpus
    itself, so this scales to 100 TB train / O(MB) probe sets. For probe sets
    too large to broadcast, drop the hint and the same plan runs as a
    shuffled hash join on the gram string (near-uniform key)."""
    d_grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    ).dropDuplicates([id_col, "gram"])
    p_grams = probes.select(
        F.col(probe_id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    ).dropDuplicates([probe_id_col, "gram"])
    hits = d_grams.join(F.broadcast(p_grams), "gram")
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.countDistinct(probe_id_col).alias("n_probes"),
    )


# ---------------------------------------------------------------------------
# Token-window document chunking
# ---------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Splits documents into fixed-size token windows with overlap — the
    standard pre-tokenization sharding step of an LLM training pipeline.

    Returns (doc_id, chunk_id, n_chunk_tokens, chunk) where chunk_id is the
    0-based window index and windows start every ``chunk_tokens - overlap``
    tokens. The final partial window is kept (n_chunk_tokens may be short).

    Pure JVM plan: sequence() of window starts + transform/slice/array_join
    inside whole-stage codegen, then posexplode — one narrow scan, no
    shuffle, no Python."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(text_col)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.lit(0),
            F.floor((F.size(toks) - F.lit(1)).cast("double") / F.lit(step)).cast("long")
            * F.lit(step),
        ),
        F.lit(step),
    )
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(toks, s + 1, chunk_tokens), " ")
    )
    out = df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk"))
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(F.split(F.col("chunk"), " ")).cast("long").alias("n_chunk_tokens"),
        "chunk",
    )
