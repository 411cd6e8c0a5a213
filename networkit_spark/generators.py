"""Deterministic graph generators (reference: cpp/generators/, Python
networkit/generators.py). Every generator derives randomness from
``xxhash64(index, seed)`` so output is a pure function of the parameters —
no ``rand()`` tied to task scheduling, fully reproducible under AQE/replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .graph import Graph

_U53 = 2 ** 53


def _uniform(*cols) -> F.Column:
    """Deterministic Uniform(0,1) from hashed columns."""
    return (F.abs(F.xxhash64(*cols)) % F.lit(_U53)).cast("double") / F.lit(float(_U53))


def erdos_renyi(
    spark: SparkSession,
    n: int,
    p: float,
    seed: int = 42,
    directed: bool = False,
    hash_fn: str = "xxhash",
) -> Graph:
    """G(n, p) via per-pair Bernoulli on hash(i, j, seed)
    (reference ErdosRenyiGenerator.h:20-39 uses sequential skip-sampling —
    inherently serial; the distributed analog enumerates the pair space,
    fine for fixture sizes, O(n²) rows). Use :func:`rmat` for scale.

    ``hash_fn="md5"`` swaps the JVM xxhash64 for the portable 60-bit md5
    hash with an INTEGER threshold (hash60 < floor(p·2^60)) — bit-identical
    in any engine with md5, which is how the ``gen_er`` oracle hard-verifies
    the Bernoulli machinery cross-engine."""
    pairs = (
        spark.range(n).withColumnRenamed("id", "src")
        .crossJoin(spark.range(n).withColumnRenamed("id", "dst"))
    )
    pairs = pairs.filter(
        F.col("src") != F.col("dst") if directed else F.col("src") < F.col("dst")
    )
    if hash_fn == "md5":
        from .functions.dedup import hash60

        key = F.concat_ws(
            ":",
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
            F.lit(str(seed)),
        )
        keep = hash60(key) < int(p * float(2**60))
    else:
        keep = _uniform("src", "dst", F.lit(seed)) < p
    edges = pairs.filter(keep).withColumn("weight", F.lit(1.0))
    return Graph(edges, directed=directed, weighted=False, num_nodes=n)


def rmat(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    d: float = 0.05,
    seed: int = 42,
    num_partitions: int | None = None,
) -> Graph:
    """R-MAT power-law generator (reference cpp/generators/RmatGenerator.cpp;
    web-like defaults per FIXTURES.md §8): 2^scale nodes,
    edge_factor·2^scale edges. Per edge index e and recursion level l the
    quadrant comes from hash(e, l, seed) — a pure projection over
    ``spark.range(m)``: embarrassingly parallel, zero shuffle, O(scale)
    JVM-side ops per edge. Self-loops kept, multi-edges collapsed by weight.
    """
    n = 2 ** scale
    m = edge_factor * n
    df = spark.range(0, m, 1, num_partitions or spark.sparkContext.defaultParallelism)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        r = _uniform("id", F.lit(level), F.lit(seed))
        sbit = F.when(r < a + b, 0).otherwise(1)
        dbit = F.when(
            (r < a) | ((r >= a + b) & (r < a + b + c)), 0
        ).otherwise(1)
        src = src * 2 + sbit
        dst = dst * 2 + dbit
    edges = (
        df.select(src.alias("u"), dst.alias("v"))
        .select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return Graph(edges, directed=False, weighted=True, num_nodes=n)


def clustered_random(
    spark: SparkSession,
    n: int,
    k: int,
    p_in: float = 1.0,
    p_out: float = 0.0,
    seed: int = 42,
) -> Graph:
    """ClusteredRandomGraphGenerator analog (used by the reference PLP tests,
    CommunityGTest.cpp:68-106): node i belongs to cluster i % k; pair (i,j)
    is an edge w.p. p_in within a cluster, p_out across."""
    pairs = (
        spark.range(n).withColumnRenamed("id", "src")
        .crossJoin(spark.range(n).withColumnRenamed("id", "dst"))
        .filter(F.col("src") < F.col("dst"))
    )
    same = (F.col("src") % k) == (F.col("dst") % k)
    u = _uniform("src", "dst", F.lit(seed))
    edges = pairs.filter(
        (same & (u < p_in)) | (~same & (u < p_out))
    ).withColumn("weight", F.lit(1.0))
    return Graph(edges, directed=False, weighted=False, num_nodes=n)


def stochastic_blockmodel(
    spark: SparkSession,
    membership: "DataFrame | list[int]",
    affinity: list[list[float]],
    seed: int = 42,
    hash_fn: str = "xxhash",
) -> Graph:
    """StochasticBlockmodel.cpp:24-39: pair (u, v) is an edge with
    probability ``affinity[block(u)][block(v)]`` — the full-matrix
    generalization of :func:`clustered_random` (which is the planted-
    partition special case of uniform in/out probabilities).

    ``membership`` is a (node, block) DataFrame or a Python list (node i →
    block). The affinity matrix is broadcast as a tiny (a, b, p) relation;
    the edge draw is the deterministic hash-uniform, so the graph is a pure
    function of (membership, affinity, seed) independent of partitioning.

    ``hash_fn="md5"`` swaps the JVM xxhash64 draw for the portable 60-bit
    md5 hash with per-block-pair INTEGER thresholds (hash60(src:dst:seed) <
    floor(p·2^60)) — bit-identical in any engine with md5, which is how the
    ``gen_sbm`` oracle hard-verifies the block-Bernoulli machinery
    cross-engine (same scheme as :func:`erdos_renyi`'s ``gen_er``).

    Like the reference's forNodePairs this is exact Bernoulli-per-pair —
    O(n²) pair enumeration. At corpus scale draw per-block-pair edge COUNTS
    (Binomial) and index-sample pairs instead, the chung_lu_sampled shape;
    the exact variant exists for test parity.
    """
    if not isinstance(membership, DataFrame):
        membership = spark.createDataFrame(
            list(enumerate(membership)), "node long, block long"
        )
    n_blocks = len(affinity)
    for row in affinity:
        if len(row) != n_blocks:
            raise ValueError("affinity matrix must be square (nBlocks x nBlocks)")
    aff = spark.createDataFrame(
        [
            (a, b, float(affinity[a][b]), int(affinity[a][b] * float(2**60)))
            for a in range(n_blocks)
            for b in range(n_blocks)
        ],
        "a long, b long, p double, t long",
    )
    mu = membership.select(F.col("node").alias("src"), F.col("block").alias("a"))
    mv = membership.select(F.col("node").alias("dst"), F.col("block").alias("b"))
    pairs = (
        mu.crossJoin(mv)
        .filter(F.col("src") < F.col("dst"))
        .join(F.broadcast(aff), ["a", "b"])
    )
    if hash_fn == "md5":
        from .functions.dedup import hash60

        key = F.concat_ws(
            ":",
            F.col("src").cast("string"),
            F.col("dst").cast("string"),
            F.lit(str(seed)),
        )
        keep = hash60(key) < F.col("t")
    else:
        keep = _uniform("src", "dst", F.lit(seed)) <= F.col("p")
    edges = pairs.filter(keep).select(
        "src", "dst", F.lit(1.0).alias("weight")
    )
    return Graph(
        edges, directed=False, weighted=False,
        num_nodes=membership.count(),
    )


def barabasi_albert_like(
    spark: SparkSession, n: int, attach: int = 4, seed: int = 42
) -> Graph:
    """Preferential-attachment-flavored power-law graph
    (BarabasiAlbertGenerator analog). True BA is sequential; the
    deterministic distributed analog attaches node i to ``attach`` targets
    drawn ∝ 1/rank via an inverse-power transform of hash(i, j, seed) —
    reproduces the heavy-tailed in-degree profile without sequential state."""
    df = spark.range(1, n).withColumnRenamed("id", "src")
    targets = df.select(
        "src",
        F.explode(F.sequence(F.lit(0), F.lit(attach - 1))).alias("j"),
    )
    u = _uniform("src", "j", F.lit(seed))
    # target rank ~ floor(src^(u)) — earlier nodes get polynomially more mass
    tgt = F.floor(F.pow(F.col("src").cast("double"), u)).cast("long") % F.col("src")
    edges = (
        targets.select("src", tgt.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges, directed=False, weighted=False, num_nodes=n)


def hub_skew_graph(
    spark: SparkSession, n: int, m: int, hub_fraction: float = 0.05, seed: int = 42
) -> Graph:
    """Skew fixture (FIXTURES.md §8): one hub node receives ``hub_fraction``
    of all edges; the rest are uniform random. Exercises salting /
    high-degree splitting and AQE skew handling."""
    df = spark.range(m)
    u = _uniform("id", F.lit(seed))
    src = (F.abs(F.xxhash64("id", F.lit(seed + 1))) % F.lit(n)).cast("long")
    rnd_dst = (F.abs(F.xxhash64("id", F.lit(seed + 2))) % F.lit(n)).cast("long")
    dst = F.when(u < hub_fraction, F.lit(0).cast("long")).otherwise(rnd_dst)
    edges = (
        df.select(src.alias("u"), dst.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return Graph(edges, directed=False, weighted=True, num_nodes=n)


def powerlaw_degree_sequence(
    spark: SparkSession,
    n: int,
    gamma: float = 2.5,
    min_deg: int = 1,
    max_deg: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(node, degree) with degree ~ discrete power law P(k) ∝ k^-gamma on
    [min_deg, max_deg] (reference cpp/generators/PowerlawDegreeSequence.cpp
    draws sequentially from the same inverse CDF; here each node's degree is
    an independent pure function of hash(node, seed) — one projection, no
    shuffle, no driver state)."""
    if max_deg is None:
        max_deg = max(min_deg + 1, int(round(n ** 0.5)))
    u = _uniform("id", F.lit(seed), F.lit("plds"))
    g1 = 1.0 - gamma
    lo, hi = float(min_deg) ** g1, float(max_deg + 1) ** g1
    k = F.floor(F.pow(F.lit(lo) + u * F.lit(hi - lo), F.lit(1.0 / g1)))
    return spark.range(n).select(
        F.col("id").alias("node"),
        F.least(F.greatest(k, F.lit(min_deg)), F.lit(max_deg)).cast("long").alias("degree"),
    )


def fit_powerlaw_gamma(graph: Graph, min_deg: int = 1) -> float:
    """MLE power-law exponent of the degree distribution
    (PowerlawDegreeSequence::setGammaFromAverageDegree analog via the
    standard Hill estimator gamma = 1 + n / Σ ln(d_i / d_min)): one
    distributed aggregation."""
    deg = graph.degrees().filter(F.col("degree") >= min_deg)
    row = deg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.log(F.col("degree") / F.lit(float(min_deg)) + F.lit(1e-12))).alias("s"),
    ).collect()[0]
    if not row["n"] or not row["s"]:
        return float("nan")
    return 1.0 + row["n"] / float(row["s"])


def watts_strogatz(
    spark: SparkSession, n: int, k: int = 4, p: float = 0.1, seed: int = 42
) -> Graph:
    """Watts–Strogatz small world (cpp/generators/WattsStrogatzGenerator.cpp):
    ring lattice where node i links its k/2 clockwise neighbors, then each
    lattice edge rewires its far endpoint w.p. ``p`` to a hash-uniform node.
    Pure projection over the n·k/2 lattice edge indices — no shuffle until
    the final dedup agg; rewiring is a per-edge deterministic hash draw.

    The reference redraws until the target is neither the source nor an
    existing neighbor; the distributed analog draws a FIXED fan of 8
    salted candidates per rewired edge and keeps the first that is neither
    the source nor inside the source's ring neighborhood (all 8 invalid —
    probability ~((k+1)/n)^8 — falls back to the lattice edge). Residual
    deviation: two rewired edges landing on the same pair merge in the
    final dedup (O(p²k²/n) per pair), where the sequential reference would
    redraw the second one."""
    half = max(1, k // 2)
    lattice = spark.range(n).select(
        F.col("id").alias("src"),
        F.explode(F.sequence(F.lit(1), F.lit(half))).alias("j"),
    )
    ring_dst = (F.col("src") + F.col("j")) % F.lit(n)
    cands = F.array(
        *[
            (
                F.abs(F.xxhash64("src", "j", F.lit(seed), F.lit(f"ws{t}")))
                % F.lit(n)
            ).cast("long")
            for t in range(8)
        ]
    )
    ring_gap = lambda c: F.least(  # noqa: E731 — ring distance src<->c
        F.pmod(c - F.col("src"), F.lit(n)), F.pmod(F.col("src") - c, F.lit(n))
    )
    valid = F.filter(cands, lambda c: ring_gap(c) > F.lit(half))
    rnd_dst = F.coalesce(F.element_at(valid, 1), ring_dst)
    rewire = _uniform("src", "j", F.lit(seed)) < F.lit(p)
    edges = (
        lattice.select("src", F.when(rewire, rnd_dst).otherwise(ring_dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges, directed=False, weighted=False, num_nodes=n)


def chung_lu(spark: SparkSession, degrees: DataFrame, seed: int = 42) -> Graph:
    """Exact Chung–Lu (cpp/generators/ChungLuGenerator.cpp semantics): given
    (node, degree), pair (i, j) is an edge independently w.p.
    min(1, w_i·w_j / S). All-pairs Bernoulli — O(n²) candidate rows, for
    FIXTURE sizes and oracle parity only; use :func:`chung_lu_sampled` at
    scale."""
    S = degrees.agg(F.sum("degree")).collect()[0][0] or 1
    a = degrees.select(F.col("node").alias("src"), F.col("degree").alias("wa"))
    b = degrees.select(F.col("node").alias("dst"), F.col("degree").alias("wb"))
    pairs = a.crossJoin(b).filter(F.col("src") < F.col("dst"))
    pij = F.least(F.lit(1.0), F.col("wa") * F.col("wb") / F.lit(float(S)))
    edges = (
        pairs.filter(_uniform("src", "dst", F.lit(seed), F.lit("cl")) < pij)
        .select("src", "dst")
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges, directed=False, weighted=False)


def chung_lu_sampled(
    spark: SparkSession, degrees: DataFrame, seed: int = 42
) -> Graph:
    """Scale-path Chung–Lu: draw S/2 candidate edges, each endpoint an
    independent degree-weighted draw (the classic 'fast Chung–Lu' sampler —
    same expected degree sequence, no all-pairs). Endpoint draws use the
    bucketed inverse-CDF interval join in plans/sample.py: two shuffles on
    near-uniform keys regardless of skew, so a 10^9-node sequence costs the
    same plan shape as a 10^3-node one. Self-loops dropped, multi-edges
    collapsed."""
    from .plans.sample import weighted_sample

    S = int(degrees.agg(F.sum("degree")).collect()[0][0] or 0)
    m = S // 2
    w = degrees.select("node", F.col("degree").cast("double").alias("w"))
    u = weighted_sample(w, "w", m, seed=seed * 2 + 1).select(
        "trial", F.col("node").alias("u")
    )
    v = weighted_sample(w, "w", m, seed=seed * 2 + 2).select(
        "trial", F.col("node").alias("v")
    )
    edges = (
        u.join(v, "trial")
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return Graph(edges, directed=False, weighted=True)


def havel_hakimi(spark: SparkSession, degrees: list[int]) -> Graph:
    """Havel–Hakimi realization of a degree sequence
    (cpp/generators/HavelHakimiGenerator.cpp) — the algorithm is inherently
    sequential (repeatedly wire the highest-residual node to the next
    highest), so like the reference this builds the edge list driver-side
    and parallelizes the result; it is a TEST-FIXTURE generator, not a
    scale path. Raises ValueError if the sequence is not graphical."""
    import heapq

    n = len(degrees)
    heap = [(-d, i) for i, d in enumerate(degrees) if d > 0]
    heapq.heapify(heap)
    edges = []
    while heap:
        d, i = heapq.heappop(heap)
        d = -d
        if len(heap) < d:
            raise ValueError("degree sequence is not graphical")
        taken = [heapq.heappop(heap) for _ in range(d)]
        for dj, j in taken:
            edges.append((min(i, j), max(i, j), 1.0))
        for dj, j in taken:
            if -dj - 1 > 0:
                heapq.heappush(heap, (dj + 1, j))
    df = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    return Graph(df, directed=False, weighted=False, num_nodes=n)


def dorogovtsev_mendes(spark: SparkSession, n: int, seed: int = 42) -> Graph:
    """Dorogovtsev–Mendes growth (cpp/generators/DorogovtsevMendesGenerator.cpp):
    start from a triangle; each new node picks a hash-uniform existing EDGE
    and connects to both its endpoints. The growth recurrence is sequential
    (edge t's endpoints depend on all earlier picks), so — like the
    reference — the edge list is built driver-side in O(n) and
    parallelized; fixture-scale generator."""
    if n < 3:
        raise ValueError("n >= 3")
    import hashlib

    edges = [(0, 1), (1, 2), (0, 2)]
    for v in range(3, n):
        h = int(hashlib.md5(f"dm|{seed}|{v}".encode()).hexdigest()[:15], 16)
        a, b = edges[h % len(edges)]
        edges.append((a, v))
        edges.append((b, v))
    df = spark.createDataFrame(
        [(min(a, b), max(a, b), 1.0) for a, b in edges],
        "src long, dst long, weight double",
    )
    return Graph(df, directed=False, weighted=False, num_nodes=n)


def edge_switching(graph: Graph, rounds: int = 20, seed: int = 42) -> Graph:
    """Degree-preserving randomization
    (cpp/generators/EdgeSwitchingMarkovChainGenerator.cpp): the sequential
    Markov chain swaps two random edges per step; the distributed analog
    does a ROUND of parallel disjoint swaps per superstep — every edge
    hashes into a pairing bucket, buckets holding exactly two edges propose
    the swap {(a,b),(c,d)} → {(a,d),(c,b)} (with a hash-bit orientation
    flip, as in the sequential chain), and a proposal commits only if it
    creates no self-loop and no edge that already exists. Each round is one
    bucket-shuffle + one anti-join; disjoint buckets make all swaps in a
    round independent, so the result is a uniform-ish degree-preserving
    shuffle after O(rounds) supersteps regardless of graph size."""
    edges = graph.edges.select("src", "dst").persist()
    m = edges.count()
    if m < 2:
        return graph
    n_buckets = max(1, m // 2)
    for r in range(rounds):
        b = edges.withColumn(
            "bkt", F.abs(F.xxhash64("src", "dst", F.lit(seed), F.lit(r))) % F.lit(n_buckets)
        ).withColumn("k", F.xxhash64("dst", "src", F.lit(seed), F.lit(r + 1)))
        cnt = b.groupBy("bkt").agg(F.count("*").alias("c"))
        paired = b.join(cnt.filter(F.col("c") == 2).select("bkt"), "bkt")
        agg = paired.groupBy("bkt").agg(
            F.min_by(F.struct("src", "dst"), "k").alias("e1"),
            F.max_by(F.struct("src", "dst"), "k").alias("e2"),
        )
        flip = (F.abs(F.xxhash64("bkt", F.lit(seed), F.lit(r + 7))) % 2) == 0
        prop = agg.select(
            "bkt",
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b2"),
            F.when(flip, F.col("e2.src")).otherwise(F.col("e2.dst")).alias("c"),
            F.when(flip, F.col("e2.dst")).otherwise(F.col("e2.src")).alias("d"),
        )
        new1 = prop.select(
            "bkt", F.least("a", "d").alias("src"), F.greatest("a", "d").alias("dst")
        )
        new2 = prop.select(
            "bkt", F.least("c", "b2").alias("src"), F.greatest("c", "b2").alias("dst")
        )
        cand = new1.unionByName(new2)
        bad = (
            cand.filter(F.col("src") == F.col("dst")).select("bkt")
            .unionByName(cand.join(edges, ["src", "dst"], "left_semi").select("bkt"))
            .unionByName(
                cand.groupBy("src", "dst")
                .agg(F.count("*").alias("c"), F.collect_set("bkt").alias("bs"))
                .filter(F.col("c") > 1)
                .select(F.explode("bs").alias("bkt"))
            )
            .distinct()
        )
        ok = cand.join(bad, "bkt", "left_anti")
        dropped = paired.join(ok.select("bkt").distinct(), "bkt", "left_semi")
        nxt = (
            edges.join(
                dropped.select("src", "dst"), ["src", "dst"], "left_anti"
            ).unionByName(ok.select("src", "dst"))
        ).localCheckpoint(eager=True)
        edges.unpersist()
        edges = nxt
        edges.persist()
    out = edges.withColumn("weight", F.lit(1.0))
    return Graph(out, directed=False, weighted=False, num_nodes=graph.num_nodes())


def hyperbolic(
    spark: SparkSession,
    n: int,
    avg_degree: float = 6.0,
    gamma: float = 3.0,
    seed: int = 42,
) -> Graph:
    """Random hyperbolic graph (threshold model; reference
    cpp/generators/HyperbolicGenerator.cpp): nodes get polar coordinates
    (r, θ) in a hyperbolic disk of radius R — θ uniform, r from the
    quasi-uniform hyperbolic density with α = (gamma−1)/2 — and two nodes
    link iff their hyperbolic distance ≤ R. Yields power-law degree
    exponent ``gamma`` with strong clustering.

    Distributed plan (same banding idea the reference's native generator
    uses): nodes with r ≥ r_core can only reach partners within
    Δθ ≤ θ_max(r_core), so periphery candidates come from a self-join on
    angular sectors of width ≥ θ_max (explode into the 3 neighboring
    sectors — one equi-join shuffle); the few low-r "core" nodes (a
    vanishing fraction, they sit near the disk center and see every angle)
    are broadcast against all nodes. The exact distance check verifies every
    candidate, so the banding is a pure candidate filter, not an
    approximation."""
    import math

    alpha = (gamma - 1.0) / 2.0
    R = 2.0 * math.log(8.0 * n / (math.pi * avg_degree))
    coshR = math.cosh(R)

    # r_core: smallest radius whose worst-case pair angle is <= pi/8
    def theta_max(rc: float) -> float:
        c = (math.cosh(rc) ** 2 - coshR) / (math.sinh(rc) ** 2)
        return math.acos(max(-1.0, min(1.0, c)))

    lo, hi = 1e-6, R
    for _ in range(60):
        mid = (lo + hi) / 2
        if theta_max(mid) > math.pi / 8:
            lo = mid
        else:
            hi = mid
    r_core = hi
    tw = theta_max(r_core)
    B = max(3, int(2 * math.pi / tw))
    width = 2 * math.pi / B

    u_r = _uniform("id", F.lit(seed), F.lit("hyp_r"))
    u_t = _uniform("id", F.lit(seed), F.lit("hyp_t"))
    r = F.acosh(F.lit(1.0) + u_r * F.lit(math.cosh(alpha * R) - 1.0)) / F.lit(alpha)
    theta = u_t * F.lit(2 * math.pi)
    pts = spark.range(n).select(
        F.col("id").alias("node"), r.alias("r"), theta.alias("theta")
    ).withColumn("sector", F.floor(F.col("theta") / F.lit(width)).cast("long")).persist()

    def close(r1, t1, r2, t2):
        cd = F.cosh(r1) * F.cosh(r2) - F.sinh(r1) * F.sinh(r2) * F.cos(t1 - t2)
        return cd <= F.lit(coshR)

    periph = pts.filter(F.col("r") >= r_core)
    a = periph.select(
        F.col("node").alias("na"), F.col("r").alias("ra"),
        F.col("theta").alias("ta"), F.col("sector").alias("sa"),
    )
    b = periph.select(
        F.col("node").alias("nb"), F.col("r").alias("rb"), F.col("theta").alias("tb"),
        F.explode(
            F.array(
                (F.col("sector") + B - 1) % B, F.col("sector"), (F.col("sector") + 1) % B
            )
        ).alias("sa"),
    )
    pp = (
        a.join(b, "sa")
        .filter(F.col("na") < F.col("nb"))
        .filter(close(F.col("ra"), F.col("ta"), F.col("rb"), F.col("tb")))
        .select(F.col("na").alias("src"), F.col("nb").alias("dst"))
        .distinct()
    )
    core = pts.filter(F.col("r") < r_core).select(
        F.col("node").alias("na"), F.col("r").alias("ra"), F.col("theta").alias("ta")
    )
    cp = (
        F.broadcast(core)
        .crossJoin(pts.select(F.col("node").alias("nb"), F.col("r").alias("rb"), F.col("theta").alias("tb")))
        .filter(F.col("na") != F.col("nb"))
        .filter(close(F.col("ra"), F.col("ta"), F.col("rb"), F.col("tb")))
        .select(F.least("na", "nb").alias("src"), F.greatest("na", "nb").alias("dst"))
        .distinct()
    )
    edges = pp.unionByName(cp).distinct().withColumn("weight", F.lit(1.0))
    return Graph(edges, directed=False, weighted=False, num_nodes=n)


def lfr(
    spark: SparkSession,
    n: int,
    mu: float = 0.2,
    gamma: float = 2.5,
    beta: float = 1.5,
    min_deg: int = 4,
    max_deg: int | None = None,
    min_comm: int = 10,
    max_comm: int | None = None,
    seed: int = 42,
) -> tuple[Graph, DataFrame]:
    """LFR community benchmark analog (reference
    cpp/generators/LFRGenerator.cpp; Lancichinetti–Fortunato–Radicchi):
    power-law degrees (exponent ``gamma``), power-law community sizes
    (exponent ``beta``), mixing parameter ``mu`` = fraction of each node's
    edges leaving its community. Returns (graph, ground_truth) where
    ground_truth is (node, community).

    The reference realizes degrees exactly with sequential Havel–Hakimi
    passes; this analog keeps LFR's *distribution* semantics but wires both
    edge classes with Chung–Lu draws so everything is hash-deterministic
    and shuffle-bounded: intra-community pairs via a per-community
    self-join (bounded by max_comm² per community), inter-community pairs
    via the sampled weighted-endpoint path (plans/sample.py) with
    same-community rejection. PLP/PLM recover the planted partition at low
    mu (see tests), which is the property the reference's own
    CommunityGTest uses LFR for."""
    import hashlib

    if max_deg is None:
        max_deg = max(min_deg + 1, n // 10)
    if max_comm is None:
        max_comm = max(min_comm + 1, n // 4)

    # community sizes: deterministic power-law draws until they cover n
    sizes = []
    total, i = 0, 0
    g1 = 1.0 - beta
    lo, hi = float(min_comm) ** g1, float(max_comm + 1) ** g1
    while total < n:
        h = int(hashlib.md5(f"lfr|{seed}|{i}".encode()).hexdigest()[:13], 16)
        u = h / float(2 ** 52)
        s = int((lo + u * (hi - lo)) ** (1.0 / g1))
        s = max(min_comm, min(max_comm, s, n - total)) if n - total >= min_comm else n - total
        sizes.append(s)
        total += s
        i += 1
    bounds = []
    off = 0
    for c, s in enumerate(sizes):
        bounds.append((c, off, off + s))
        off += s
    bdf = spark.createDataFrame(bounds, "community long, clo long, chi long")

    deg = powerlaw_degree_sequence(spark, n, gamma, min_deg, max_deg, seed)
    members = deg.join(
        F.broadcast(bdf),
        (F.col("node") >= F.col("clo")) & (F.col("node") < F.col("chi")),
    ).select(
        "node", "community", "degree",
        (F.col("chi") - F.col("clo")).alias("csize"),
    )
    members = members.withColumn(
        "d_in",
        F.least(
            F.floor(F.lit(1.0 - mu) * F.col("degree")).cast("long"),
            F.col("csize") - 1,
        ),
    ).withColumn("d_out", F.col("degree") - F.col("d_in")).persist()

    # intra-community Chung-Lu: per community, p_ij = min(1, din_i*din_j/S_c)
    csum = members.groupBy("community").agg(F.sum("d_in").alias("cs"))
    ma = members.select(
        "community", F.col("node").alias("src"), F.col("d_in").alias("wa")
    )
    mb = members.select(
        "community", F.col("node").alias("dst"), F.col("d_in").alias("wb")
    )
    intra = (
        ma.join(mb, "community")
        .filter(F.col("src") < F.col("dst"))
        .join(csum, "community")
        .filter(
            _uniform("src", "dst", F.lit(seed), F.lit("lfr_in"))
            < F.least(F.lit(1.0), F.col("wa") * F.col("wb") / F.greatest(F.col("cs"), F.lit(1)))
        )
        .select("src", "dst")
    )

    # inter-community Chung-Lu via sampled weighted endpoints
    from .plans.sample import weighted_sample

    wout = members.select("node", "community", F.col("d_out").cast("double").alias("w")).filter(
        F.col("w") > 0
    )
    S_out = int(wout.agg(F.sum("w")).collect()[0][0] or 0)
    m_out = S_out // 2
    inter = None
    if m_out > 0:
        eu = weighted_sample(wout, "w", m_out, seed=seed * 3 + 1).select(
            "trial", F.col("node").alias("u"), F.col("community").alias("cu")
        )
        ev = weighted_sample(wout, "w", m_out, seed=seed * 3 + 2).select(
            "trial", F.col("node").alias("v"), F.col("community").alias("cv")
        )
        inter = (
            eu.join(ev, "trial")
            .filter(F.col("cu") != F.col("cv"))
            .select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        )
    edges = intra if inter is None else intra.unionByName(inter)
    edges = edges.distinct().withColumn("weight", F.lit(1.0))
    g = Graph(edges, directed=False, weighted=False, num_nodes=n)
    truth = members.select("node", "community")
    return g, truth
