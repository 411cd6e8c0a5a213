import hashlib

import pytest
from pyspark.sql import functions as F

from networkit_spark.functions.dedup import (
    embedding_neardup_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    simhash_fingerprints,
)
from networkit_spark.functions.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
)
from networkit_spark.functions.text import analyze_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs away", "en"),
        (1, "the quick brown fox jumps over the lazy dog and runs away", "en"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog and walks away", "en"),  # near dup
        (3, "der hund ist nicht ein fuchs und das ist gut", "de"),
        (4, "completely different content about spark dataframes and shuffles", "en"),
        (5, "x", "en"),  # shorter than shingle size
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_duplicates(spark, docs):
    d = {r["doc_id"]: r["dup_of"] for r in exact_duplicates(docs).collect()}
    assert d == {1: 0}


def test_minhash_near_dup(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught by LSH
    assert all(a < b for a, b in pairs)
    assert not any({a, b} & {4} for a, b in pairs)  # unrelated doc never pairs


def test_simhash_properties(spark, docs):
    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert fps[0] == fps[1]  # identical docs → identical fingerprints

    def ham(x, y):
        # fingerprints are sign-carrying 64-bit patterns — mask before bin()
        return bin((x ^ y) & (2 ** 64 - 1)).count("1")

    assert ham(fps[0], fps[2]) < ham(fps[0], fps[4])  # near-dup closer


def test_simhash_64bit_bands_are_spread(spark, docs):
    """The 64-bit default must populate the HIGH bits too (bits 32..63 draw
    from the salted second hash): at least one fingerprint uses the top
    16-bit band, so Hamming banding gets 65k buckets, not a constant key."""
    fps = [r["simhash"] for r in simhash_fingerprints(docs, bits=64).collect()]
    top_band = {(f >> 48) & 0xFFFF for f in fps}
    assert top_band != {0}
    # and the pair-finder verifies exactly at radius 3 over 64 bits
    from networkit_spark.functions.dedup import simhash_hamming_pairs

    pairs = simhash_hamming_pairs(docs, bits=64, max_hamming=3).collect()
    masked = {
        r["doc_id"]: r["simhash"] & (2 ** 64 - 1)
        for r in simhash_fingerprints(docs, bits=64).collect()
    }
    for p in pairs:
        assert bin(masked[p["a"]] ^ masked[p["b"]]).count("1") == p["hamming"]
        assert p["hamming"] <= 3


def test_text_profile(spark, docs):
    prof = {r["doc_id"]: r for r in analyze_documents(docs).collect()}
    assert prof[0]["n_tokens"] == 12
    assert prof[0]["lang_pred"] == "en"
    assert prof[3]["lang_pred"] == "de"
    assert prof[0]["fp64"] == prof[1]["fp64"]
    # fingerprint matches hashlib md5 prefix
    expected = int(hashlib.md5(b"x").hexdigest()[:15], 16)
    assert prof[5]["fp64"] == expected


@pytest.fixture(scope="module")
def embeddings(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.randn(20, 16).astype("float32")
    base[5] = base[0] + 0.01 * rng.randn(16).astype("float32")  # near dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_neardup(spark, embeddings):
    pairs = [(r["a"], r["b"]) for r in
             embedding_neardup_pairs(embeddings, threshold=0.95, lsh_bits=4).collect()]
    assert (0, 5) in pairs


def test_ann_bruteforce_vs_numpy(spark, embeddings):
    import numpy as np

    q = embeddings.filter("vec_id = 0").withColumnRenamed("vec_id", "query_id")
    got = [
        (r["vec_id"], r["rank"])
        for r in cosine_topk_bruteforce(embeddings, q, k=5).orderBy("rank").collect()
    ]
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in embeddings.collect()}
    q0 = vecs[0]
    sims = sorted(
        (
            (-(vecs[i] @ q0) / (np.linalg.norm(vecs[i]) * np.linalg.norm(q0)), i)
            for i in vecs if i != 0
        )
    )[:5]
    expected = [(i, r + 1) for r, (_, i) in enumerate(sims)]
    assert got == expected
    assert got[0][0] == 5  # the planted near-dup is rank 1


def test_ann_ivf_subset_of_bucket(spark, embeddings):
    q = embeddings.filter("vec_id < 2").withColumnRenamed("vec_id", "query_id")
    out = cosine_topk_ivf(embeddings, q, k=5, bits=3).collect()
    # every hit must share the query's 3-bit sign bucket
    vecs = {r["vec_id"]: r["embedding"] for r in embeddings.collect()}

    def bucket(v):
        return sum((1 << b) for b in range(3) if v[b] >= 0)

    for r in out:
        assert bucket(vecs[r["vec_id"]]) == bucket(vecs[r["query_id"]])


def test_multimodal_decode_deterministic(spark, docs):
    from networkit_spark.functions.multimodal import (
        decode_images,
        resize_images,
        sample_video_frames,
        synthesize_media_from_documents,
    )

    media = synthesize_media_from_documents(
        docs.withColumn("n_chars", F.length("text"))
    )
    a = sorted(decode_images(media, dims=4).collect())
    b = sorted(decode_images(media.repartition(7), dims=4).collect())
    assert a == b  # partitioning-independent
    assert all(64 <= r["width"] < 2048 for r in a)
    rs = resize_images(media, 32, 32).collect()
    assert all(len(r["payload"]) == 32 for r in rs)  # sha256 digest stub
    with pytest.raises(NotImplementedError):
        decode_images(media, real=True)
    vids = media.withColumn("media_type", F.lit("video"))
    frames = sample_video_frames(vids, every_n=16).collect()
    assert len(frames) > len(a)  # multiple frames per video


def test_ivf_train_deterministic_partition(spark, embeddings):
    from networkit_spark.functions.similarity import ivf_train, _assign_expr, _units

    cents = ivf_train(embeddings, nlist=4, iters=2)
    got = {r["cid"]: r["cv"] for r in cents.collect()}
    assert sorted(got) == [0, 1, 2, 3]
    assert all(len(v) == 16 for v in got.values())
    # training is deterministic: a second run is identical
    again = {r["cid"]: r["cv"] for r in ivf_train(embeddings, nlist=4, iters=2).collect()}
    assert got == again
    # every vector lands in exactly one cell
    units = _units(embeddings, "embedding", "vec_id", "vec_id")
    inv = _assign_expr(units, cents, "vec_id").collect()
    assert len(inv) == 20
    assert len({r["vec_id"] for r in inv}) == 20


def test_ivf_trained_scores_match_bruteforce(spark, embeddings):
    """Trained IVF is a PRUNED brute force: every returned (query, hit)
    cosine must equal the brute-force cosine for the same pair, and the
    planted near-dup (same cell with high probability at nlist=2) ranks 1."""
    from networkit_spark.functions.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf_trained,
    )

    q = embeddings.filter("vec_id < 2").withColumnRenamed("vec_id", "query_id")
    bf = {
        (r["query_id"], r["vec_id"]): r["cos"]
        for r in cosine_topk_bruteforce(embeddings, q, k=20).collect()
    }
    out = cosine_topk_ivf_trained(
        embeddings, q, k=5, nlist=4, iters=2, nprobe=2
    ).collect()
    assert out
    for r in out:
        assert bf[(r["query_id"], r["vec_id"])] == r["cos"]
    # ranks are dense from 1 within each query
    ranks = {}
    for r in out:
        ranks.setdefault(r["query_id"], []).append(r["rank"])
    for rs in ranks.values():
        assert sorted(rs) == list(range(1, len(rs) + 1))


def test_ivf_trained_full_probe_equals_bruteforce(spark, embeddings):
    """nprobe = nlist scores the whole corpus → exactly brute force."""
    from networkit_spark.functions.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf_trained,
    )

    q = embeddings.filter("vec_id < 2").withColumnRenamed("vec_id", "query_id")
    bf = sorted(
        tuple(r) for r in cosine_topk_bruteforce(embeddings, q, k=5).collect()
    )
    ivf = sorted(
        tuple(r)
        for r in cosine_topk_ivf_trained(
            embeddings, q, k=5, nlist=4, iters=2, nprobe=4
        ).collect()
    )
    assert bf == ivf


def test_dedup_clusters_transitive_canonical(spark, docs):
    """0–1 exact dup, 1–2 near dup: the cluster is transitive — all three
    canonicalize to 0 even if LSH never paired (0,2) directly; everything
    else is a singleton mapped to itself."""
    from networkit_spark.functions.dedup import dedup_clusters

    got = {
        r["doc"]: r["canonical"]
        for r in dedup_clusters(docs, threshold=0.5, rounds=4).collect()
    }
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == 3 and got[4] == 4 and got[5] == 5
    assert len(got) == 6


# -- line-level (paragraph) dedup ------------------------------------------

def test_line_dedup_drops_cross_doc_lines(spark):
    from networkit_spark.functions.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "keep me\nBOILER\nunique one"),
            (2, "BOILER\nother text"),
            (3, "solo document"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs, min_dup=2).collect()}
    assert out[1].clean_text == "keep me\nunique one"
    assert (out[1].n_lines, out[1].n_removed) == (3, 1)
    assert out[2].clean_text == "other text"
    assert out[3].clean_text == "solo document"
    assert out[3].n_removed == 0


def test_line_dedup_within_doc_repeat_not_dropped(spark):
    from networkit_spark.functions.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "same\nsame"), (2, "hello")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in line_dedup(docs, min_dup=2).collect()}
    # 'same' occurs twice but only in ONE document -> ndocs=1 -> kept
    assert out[1].clean_text == "same\nsame"


def test_line_dedup_keep_first(spark):
    from networkit_spark.functions.dedup import line_dedup

    docs = spark.createDataFrame(
        [(5, "BOILER\nx"), (9, "BOILER\ny")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in line_dedup(docs, min_dup=2, keep_first=True).collect()}
    # canonical copy survives in the smallest (doc_id, pos)
    assert out[5].clean_text == "BOILER\nx"
    assert out[9].clean_text == "y"


def test_line_dedup_order_preserved_and_empty_result(spark):
    from networkit_spark.functions.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "a\nb\nc"), (2, "a\nb\nc")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in line_dedup(docs, min_dup=2).collect()}
    assert out[1].clean_text == "" and out[1].n_removed == 3
    docs2 = spark.createDataFrame([(1, "z\ny\nx")], "doc_id long, text string")
    out2 = line_dedup(docs2).collect()[0]
    assert out2.clean_text == "z\ny\nx"  # original order, not sorted
