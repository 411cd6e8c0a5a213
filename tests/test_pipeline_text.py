"""Training-pipeline text operators: Gopher repetition profile, token-window
chunking, and n-gram train/test decontamination (functions/text.py).

Semantics pinned against hand-computed values on tiny fixtures; the DuckDB
hash-match oracles live in __spark_entry__ (repetition_profile / chunks /
contamination) and tools/check_oracles.py.
"""

import pytest
from pyspark.sql import functions as F

from networkit_spark.functions.text import (
    chunk_documents,
    gopher_keep,
    ngram_contamination,
    repetition_profile,
    word_ngrams,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e f g h"),                     # all distinct tokens
        (2, "x x x x x x x x"),                     # maximal repetition
        (3, "one line\none line\nother"),           # duplicate lines
        (4, "spam spam ham spam spam ham eggs #!"), # repeated bigram + symbols
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_word_ngrams_order_and_short_doc(spark, docs):
    got = docs.select("doc_id", word_ngrams("text", 3).alias("g")).collect()
    by_id = {r["doc_id"]: r["g"] for r in got}
    assert by_id[1][:2] == ["a b c", "b c d"]
    assert len(by_id[1]) == 6  # 8 tokens -> 6 trigrams
    short = spark.createDataFrame([(9, "a b")], ["doc_id", "text"])
    assert short.select(word_ngrams("text", 3).alias("g")).collect()[0]["g"] == []


def test_repetition_profile_values(spark, docs):
    prof = {r["doc_id"]: r.asDict() for r in repetition_profile(docs).collect()}
    # doc 1: no repetition at all
    assert prof[1]["dup_token_frac"] == 0.0
    assert prof[1]["top2gram_frac"] == pytest.approx(2 / 8)  # every bigram unique
    # doc 2: 8 copies of one token -> 7/8 duplicated; the single bigram
    # "x x" occurs 7 times -> 7*2/8
    assert prof[2]["dup_token_frac"] == pytest.approx(7 / 8)
    assert prof[2]["top2gram_frac"] == pytest.approx(14 / 8)
    # doc 3: 3 newline lines, one duplicated -> 1/3
    assert prof[3]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    # doc 4: "spam spam" occurs twice (positions 1 and 4) -> 2*2/8
    assert prof[4]["top2gram_frac"] == pytest.approx(4 / 8)
    assert prof[4]["symbol_ratio"] > 0.0
    assert prof[1]["mean_word_len"] == pytest.approx(1.0)


def test_gopher_keep_flags(spark, docs):
    kept = {r["doc_id"]: r["keep"] for r in gopher_keep(repetition_profile(docs)).collect()}
    assert kept[1] is True          # clean doc passes
    assert kept[2] is False         # dup_token_frac 0.875 > 0.5


def test_chunk_documents_partition_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=32, overlap=4).orderBy("chunk_id").collect()
    # starts every 28 tokens: 0, 28, 56, 84 -> 4 chunks
    assert [r["chunk_id"] for r in out] == [0, 1, 2, 3]
    assert [r["n_chunk_tokens"] for r in out] == [32, 32, 32, 16]
    # overlap: chunk k starts at token 28k
    assert out[1]["chunk"].split(" ")[0] == "t28"
    assert out[0]["chunk"].split(" ")[28:] == ["t28", "t29", "t30", "t31"]
    # every token appears in at least one chunk
    seen = set()
    for r in out:
        seen.update(r["chunk"].split(" "))
    assert len(seen) == 100


def test_chunk_single_short_doc(spark):
    df = spark.createDataFrame([(1, "only three tokens")], ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=32, overlap=4).collect()
    assert len(out) == 1 and out[0]["n_chunk_tokens"] == 3


def test_ngram_contamination_hits_source_only(spark):
    corpus = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely different words that never match anything here at all"),
        (3, "the quick brown fox jumps over something else entirely now"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    probes = spark.createDataFrame(
        [(100, "the quick brown fox jumps over")], ["probe_id", "text"]
    )
    got = {r["doc_id"]: r for r in ngram_contamination(docs, probes, n=5).collect()}
    # docs 1 and 3 share the 5-grams "the quick brown fox jumps" (+ "quick
    # brown fox jumps over"); doc 2 is clean
    assert set(got) == {1, 3}
    assert got[1]["n_hits"] == 2 and got[3]["n_hits"] == 2
    assert got[1]["n_probes"] == 1


def test_ngram_contamination_dedupes_repeated_grams(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e a b c d e")], ["doc_id", "text"]
    )
    probes = spark.createDataFrame([(9, "a b c d e")], ["probe_id", "text"])
    got = ngram_contamination(docs, probes, n=5).collect()
    # the gram "a b c d e" appears twice in the doc but counts once
    assert len(got) == 1 and got[0]["n_hits"] == 1


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing (Schleimer-Wilkerson-Aiken): any exact substring match of
    length >= w + k - 1 shares at least one fingerprint; disjoint-alphabet
    texts share none; density is far below the raw k-gram count."""
    from networkit_spark.functions.text import winnow_fingerprints

    shared = "the winnowing guarantee holds here"
    rows = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " suffix alpha"),
            (2, "other start " + shared + " tail omega"),
            (3, "zzzzqqqqxxxxwwwwvvvvkkkkjjjjhhhhgggg"),
        ],
        ["doc_id", "text"],
    ).select("doc_id", winnow_fingerprints("text", k=5, w=4).alias("fps"))
    fps = {r["doc_id"]: set(r["fps"]) for r in rows.collect()}
    assert fps[1] & fps[2], "common substring >= w+k-1 must share a fingerprint"
    assert not (fps[1] & fps[3])
    # density: ~2/(w+1) of positions, with a hard upper bound of #windows
    n_positions = len("prefix one " + shared + " suffix alpha") - 4
    assert 0 < len(fps[1]) < n_positions


def test_bpe_token_count_classes(spark):
    """BPE-ish pre-tokenizer counts contraction pieces, letter runs, digit
    runs and punctuation runs as separate tokens."""
    from networkit_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [(1, "it's 2024, isn't it?!")], ["doc_id", "text"]
    ).select(bpe_token_count("text").alias("n"))
    # it|'s|2024|,|isn|'t|it|?! -> 8
    assert df.collect()[0]["n"] == 8
