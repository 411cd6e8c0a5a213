"""Deduplication operators for web-scale training-data pipelines.

Five families, all shuffle-bounded (no n² compare at scale):
- exact: hash-groupBy on md5(text)
- MinHash + LSH: char-shingles → 60-bit hashes → P linear-permutation
  minhashes → B bands → bucket join → exact-Jaccard verification
- SimHash: per-token hash sign-sums per bit → 60-bit fingerprint
- n-gram Jaccard: word n-grams through the same LSH machinery
- embedding cosine near-dup: sign-bit LSH bucketing + in-bucket verify

Everything below is built from engine-portable primitives (md5, substring,
arithmetic) so each operator has an exact DuckDB-SQL oracle twin. All hot
paths are JVM-side higher-order functions on arrays — no Python UDFs.

Cost model at 100 TB: shingling multiplies rows by ~|text|/k inside a
projection (no shuffle); the only shuffles are the band-bucket groupBy and
the verification join, both keyed by short hashes with near-uniform
distribution (md5), so no skew salting is needed — unlike the graph ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# linear-permutation constants: h_p(x) = (A_p * x + B_p) mod M over 31-bit
# reduced hashes (products stay < 2^62 — identical overflow-free arithmetic
# in Spark and DuckDB)
MOD31 = 2147483647
DEFAULT_PERMS = 16
DEFAULT_BANDS = 4  # 4 rows/band at 16 perms


def _perm_consts(p: int) -> tuple[int, int]:
    # deterministic, coprime-ish constants derived from small primes
    return (1_000_003 * (p + 1) % MOD31, 777_767_777 * (p + 7) % MOD31)


def hash60(col: Column) -> Column:
    """Portable 60-bit string hash: first 15 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def char_shingles(col, k: int = 9) -> Column:
    """Distinct character k-shingles as an array<string>; empty array for
    texts shorter than k."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c) - F.lit(k - 1)
    return F.when(
        n >= 1,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k)))
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(col, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) as array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ")
    cnt = F.size(toks) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), cnt - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_hashes(col, k: int = 9) -> Column:
    """array<long> of 31-bit-reduced shingle hashes (distinct)."""
    return F.array_distinct(
        F.transform(char_shingles(col, k), lambda s: F.pmod(hash60(s), F.lit(MOD31)))
    )


def minhash_signature(hashes: Column, num_perms: int = DEFAULT_PERMS) -> Column:
    """array<long> minhash signature over pre-hashed shingles."""
    sigs = []
    for p in range(num_perms):
        a, b = _perm_consts(p)
        sigs.append(
            F.array_min(
                F.transform(hashes, lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MOD31)))
            )
        )
    return F.array(*sigs)


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dup_of): every doc whose exact text already appears under a
    smaller id, mapped to that smallest id (survivors are absent)."""
    h = df.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h"))
    keep = h.groupBy("h").agg(F.min("doc_id").alias("dup_of"))
    return (
        h.join(keep, "h")
        .filter(F.col("doc_id") != F.col("dup_of"))
        .select("doc_id", "dup_of")
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Survivor rows (min id per distinct text)."""
    dups = exact_duplicates(df, text_col, id_col)
    return df.join(dups.select(F.col("doc_id").alias(id_col)), id_col, "left_anti")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 9,
    num_perms: int = DEFAULT_PERMS,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    use_word_ngrams: bool = False,
    ngram_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs (a, b, jaccard) with a < b, exact Jaccard over
    the shingle-hash sets >= threshold, candidate-filtered by banded minhash
    (a pair is compared only if some band agrees)."""
    rows = num_perms // bands
    feats = word_ngrams(text_col, ngram_n) if use_word_ngrams else char_shingles(text_col, k)
    hashes = F.array_distinct(
        F.transform(feats, lambda s: F.pmod(hash60(s), F.lit(MOD31)))
    )
    base = df.select(
        F.col(id_col).alias("doc"), hashes.alias("hs")
    ).filter(F.size("hs") > 0)
    sig = base.select("doc", "hs", minhash_signature(F.col("hs"), num_perms).alias("sig"))
    sig = sig.persist()
    # bands: hash each signature slice to a bucket key
    bands_df = sig.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.md5(F.concat_ws("_", *[F.col("sig")[bi * rows + r].cast("string") for r in range(rows)])).alias("bkey"),
                )
                for bi in range(bands)
            ])
        ).alias("bk"),
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    cand = (
        bands_df.alias("x")
        .join(bands_df.alias("y"), ["band", "bkey"])
        .filter(F.col("x.doc") < F.col("y.doc"))
        .select(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .distinct()
    )
    sa = sig.select(F.col("doc").alias("a"), F.col("hs").alias("ha"))
    sb = sig.select(F.col("doc").alias("b"), F.col("hs").alias("hb"))
    verified = (
        cand.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("ha", "hb")).cast("double")
                / F.size(F.array_union("ha", "hb"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """(doc_id, simhash): per-token 60-bit hashes; fingerprint bit b is set
    iff Σ_tokens (±1 by token-hash bit b, weighted by multiplicity) > 0."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    h = toks.select("doc_id", hash60(F.col("tok")).alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = h.groupBy("doc_id").agg(*aggs)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.alias("simhash"))


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    lsh_bits: int = 8,
) -> DataFrame:
    """(a, b, cos) pairs with cosine >= threshold, candidate-filtered by a
    sign-bit LSH over the first ``lsh_bits`` dimensions (near-identical
    vectors share all sign bits with high probability). Exact cosine verify
    in-bucket. Scale path: bucket count 2^bits bounds each join partition."""
    v = F.col(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    code = None
    for b in range(lsh_bits):
        bit = F.when(F.element_at(v, b + 1) >= 0, F.lit(2 ** b)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    base = df.select(
        F.col(id_col).alias("doc"), v.alias("v"), norm.alias("nrm"), code.alias("bucket")
    ).filter(F.col("nrm") > 0)
    a = base.select(F.col("doc").alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na"), "bucket")
    b_ = base.select(F.col("doc").alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"), "bucket")
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.join(b_, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", (dot / (F.col("na") * F.col("nb"))).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )
