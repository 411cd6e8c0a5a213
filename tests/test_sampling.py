"""Deterministic sampling ops: partitioning-independence is the contract."""

from pyspark.sql import functions as F

from networkit_spark.functions.sampling import (
    hash_split,
    sample_fraction,
    sample_per_key,
)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_hash_split_partitioning_independent(spark):
    docs = _docs(spark)
    a = hash_split(docs, on="doc_id")
    b = hash_split(docs.repartition(17), on="doc_id")
    rows_a = {(r["doc_id"], r["split"]) for r in a.select("doc_id", "split").collect()}
    rows_b = {(r["doc_id"], r["split"]) for r in b.select("doc_id", "split").collect()}
    assert rows_a == rows_b
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > 0.9 * docs.count()


def test_sample_fraction_rate_and_determinism(spark):
    docs = _docs(spark)
    s1 = {r["doc_id"] for r in sample_fraction(docs, 0.25, on="doc_id").select("doc_id").collect()}
    s2 = {r["doc_id"] for r in sample_fraction(docs.repartition(5), 0.25, on="doc_id").select("doc_id").collect()}
    assert s1 == s2
    n = docs.count()
    assert 0.15 * n < len(s1) < 0.35 * n
    # different seed -> different sample
    s3 = {r["doc_id"] for r in sample_fraction(docs, 0.25, on="doc_id", seed=7).select("doc_id").collect()}
    assert s3 != s1


def test_sample_per_key_caps_and_determinism(spark):
    docs = _docs(spark)
    capped = sample_per_key(docs, key="source", n=3, on="doc_id")
    per = {r["source"]: r["n"] for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(v <= 3 for v in per.values())
    # sources with >=3 docs keep exactly 3
    full = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for k, v in full.items():
        assert per[k] == min(v, 3)
    again = sample_per_key(docs.repartition(13), key="source", n=3, on="doc_id")
    assert {tuple(r) for r in capped.select("source", "doc_id").collect()} == \
           {tuple(r) for r in again.select("source", "doc_id").collect()}
