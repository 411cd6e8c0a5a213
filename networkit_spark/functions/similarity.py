"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the (small) query set, JVM-side
  zip_with/aggregate dot products, per-query window top-k. At 100 TB the
  scan side stays fully distributed; only the query set broadcasts.
- IVF-style sign-bit variant: deterministic coarse quantizer buckets the
  corpus; queries probe only matching buckets (single-probe) — cheap but
  recall-weak (untrained cells).
- trained IVF (:func:`ivf_train` + :func:`cosine_topk_ivf_trained`): proper
  inverted-file index — deterministic spherical k-means centroids trained
  distributed (Lloyd iterations: broadcast-centroid argmax assignment +
  element-wise mean update), multi-probe search over the ``nprobe`` nearest
  lists. The FAISS IVF recipe re-expressed relationally: training touches
  each vector ``iters`` times with NO shuffle wider than (cid, pos); search
  scores only ``nprobe/nlist`` of the corpus per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..plans.ckpt import clean_local_checkpoint as _cc


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, cos, rank) — exact top-k by cosine; deterministic
    tie-break by vec_id asc. Self-matches (same id) are excluded."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nv"),
    ).filter(F.col("nv") > 0)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nq"),
    ).filter(F.col("nq") > 0)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def signbit_bucket(vec_col, bits: int = 8):
    """Deterministic coarse quantizer: integer code from the sign bits of the
    first ``bits`` dimensions."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    code = None
    for b in range(bits):
        bit = F.when(F.element_at(v, b + 1) >= 0, F.lit(2 ** b)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    return code


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing the query's sign-bit
    bucket are scored (single-probe IVF). Same output schema as brute force."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nv"),
        signbit_bucket(vec_col, bits).alias("bucket"),
    ).filter(F.col("nv") > 0)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        _norm(F.col(vec_col).cast("array<double>")).alias("nq"),
        signbit_bucket(vec_col, bits).alias("bucket"),
    ).filter(F.col("nq") > 0)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def _units(df: DataFrame, vec_col: str, id_col: str, out_id: str) -> DataFrame:
    """(id, v, nv, u): raw double vector, its norm, and the unit vector.
    Unit coords are exact elementwise divisions — bitwise reproducible by
    any engine (no reduction-order dependence)."""
    v = F.col(vec_col).cast("array<double>")
    return (
        df.select(
            F.col(id_col).alias(out_id),
            v.alias("v"),
            _norm(v).alias("nv"),
        )
        .filter(F.col("nv") > 0)
        .withColumn("u", F.transform("v", lambda x: x / F.col("nv")))
    )


def _assign_expr(units: DataFrame, cents: DataFrame, id_name: str) -> DataFrame:
    """(id, cid): nearest centroid by max dot (unit vectors → cosine), dot
    rounded to 9 decimals before the argmax so near-ties resolve identically
    across engines; tie-break = smallest cid. Broadcast join + one
    map-side-combinable aggregation keyed by the vector id."""
    dots = units.select(id_name, "u").crossJoin(F.broadcast(cents)).select(
        id_name,
        "cid",
        F.round(_dot(F.col("u"), F.col("cv")), 9).alias("dot"),
    )
    return (
        dots.groupBy(id_name)
        .agg(F.min(F.struct((-F.col("dot")).alias("nd"), F.col("cid"))).alias("b"))
        .select(id_name, F.col("b.cid").alias("cid"))
    )


def ivf_train(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic spherical k-means: returns ``(cid, cv)`` centroids.

    - init: the ``nlist`` corpus vectors with the smallest
      ``(md5-hash60(id), id)`` — a deterministic, order-independent sample
      (no host RNG, no task-order dependence).
    - each Lloyd iteration: argmax-dot assignment against broadcast
      centroids, then element-wise mean per (cid, position) — the only
      shuffle is the (cid, pos) aggregation, whose key space is
      ``nlist × dim`` regardless of corpus size. Means are rounded to 6
      decimals so reduction order cannot leak into the trained model.
    - empty cells keep their previous centroid.
    """
    from .dedup import hash60

    spark = corpus.sparkSession
    units = _units(corpus, vec_col, id_col, "vec_id").persist()
    seed_rows = (
        units.select(
            "vec_id", "u", hash60(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(nlist)
        .collect()
    )
    cents = spark.createDataFrame(
        [(i, list(r["u"])) for i, r in enumerate(seed_rows)],
        "cid int, cv array<double>",
    )
    for _ in range(iters):
        assign = _assign_expr(units, cents, "vec_id")
        means = (
            assign.join(units, "vec_id")
            .select("cid", F.posexplode("u").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
        )
        newc = means.groupBy("cid").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("ncv")
        )
        # SPHERICAL k-means: renormalize the mean back onto the unit sphere
        # (mean of unit vectors has norm < 1, shrinking with cluster spread
        # — without this the argmax-dot assignment and probe ranking favor
        # tight clusters over diffuse ones and are no longer cosine-NN).
        # Norm folds the 6-rounded means in position order (deterministic
        # IEEE result, reproducible in the DuckDB oracle); re-rounded to 6.
        nrm = F.sqrt(
            F.aggregate("ncv", F.lit(0.0), lambda a, x: a + x * x)
        )
        newc = newc.select(
            "cid",
            F.when(
                nrm > 0,
                F.transform("ncv", lambda x: F.round(x / nrm, 6)),
            )
            .otherwise(F.col("ncv"))
            .alias("ncv"),
        )
        cents = (
            cents.join(newc, "cid", "left")
            .select("cid", F.coalesce("ncv", "cv").alias("cv"))
            .transform(_cc)
        )
    units.unpersist()
    return cents


def cosine_topk_ivf_trained(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    iters: int = 3,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    centroids: DataFrame | None = None,
    cache_handle: "list | None" = None,
) -> DataFrame:
    """Trained-IVF approximate top-k (same output schema as brute force):
    every corpus vector lives in exactly one inverted list (its nearest
    trained centroid); each query scores only the ``nprobe`` nearest lists.
    Scored fraction ≈ nprobe/nlist of the corpus — the 100-TB path where
    brute force is O(N·Q). Pass ``centroids`` to reuse a trained model.

    The corpus unit-vector frame feeds BOTH the inverted-list assignment
    and the score join, so it stays persisted while the lazy result is
    alive (an unpersist before any action would be a no-op persist — the
    dominant corpus scan would then run twice); pass ``cache_handle`` to
    receive it for cleanup after consumption."""
    if centroids is None:
        centroids = ivf_train(corpus, nlist=nlist, iters=iters, vec_col=vec_col, id_col=id_col)
    c = _units(corpus, vec_col, id_col, "vec_id").persist()
    if cache_handle is not None:
        cache_handle.append(c)
    inv = _assign_expr(c, centroids, "vec_id")
    q = _units(queries, vec_col, query_id_col, "query_id")
    qd = q.select("query_id", "u").crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "cid",
        F.round(_dot(F.col("u"), F.col("cv")), 9).alias("dot"),
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("cid"))
    probes = (
        qd.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "cid")
    )
    scored = (
        inv.join(F.broadcast(probes), "cid")
        .join(c, "vec_id")
        .join(
            F.broadcast(q.select("query_id", F.col("v").alias("qv"), F.col("nv").alias("nq"))),
            "query_id",
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )
    return out
