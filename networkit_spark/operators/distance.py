"""Traversal & distance operators — frontier-join supersteps.

Reference: /root/reference/networkit/cpp/graph/BFS.cpp:17-70 (unweighted
SSSP), cpp/graph/Dijkstra.cpp:20-90 (weighted; the priority queue becomes
Bellman-Ford-style min-relaxation supersteps in Spark),
cpp/distance/Eccentricity.cpp, cpp/distance/EffectiveDiameterApproximation.cpp
(ANF/Flajolet-Martin neighborhood function via per-hop bitmask OR — maps to
``bit_or`` aggregation).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc


def bfs_distances(
    graph: Graph,
    source: int,
    max_iter: int = 10_000,
    max_dist: int | None = None,
) -> DataFrame:
    """(node, dist) for nodes reachable from source; hop counts.

    Frontier superstep: dist'[v] = min(dist[v], min over in-neighbors+1).
    Converges in eccentricity(source) rounds; each round is one join +
    min-aggregate on the (small) frontier. ``max_dist`` bounds the
    exploration ball (hop-count analog of IncompleteDijkstra,
    cpp/graph/IncompleteDijkstra.cpp:10-64): nodes beyond it are neither
    returned nor expanded."""
    if max_dist is not None:
        max_iter = min(max_iter, int(max_dist))
    sym = graph.sym_part().persist()
    sym.count()
    dist = (
        graph.nodes()
        .filter(F.col("node") == source)
        .select("node", F.lit(0).alias("dist"))
        .transform(_cc)
    )
    frontier = dist
    while max_iter > 0:
        max_iter -= 1
        reach = (
            sym.join(frontier, sym.src == frontier.node)
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        new_frontier = reach.join(dist, "node", "left_anti").transform(_cc)
        if new_frontier.isEmpty():
            break
        dist = dist.unionByName(new_frontier).transform(_cc)
        frontier = new_frontier
    sym.unpersist()
    return dist


def sssp_distances(
    graph: Graph,
    source: int,
    max_iter: int = 10_000,
    max_dist: float | None = None,
) -> DataFrame:
    """Weighted single-source shortest paths (Dijkstra semantics via
    Bellman-Ford supersteps): (node, dist DOUBLE) for reachable nodes.
    Rejects negative weights up front — the reference assumes Dijkstra
    preconditions, and through ``sym()`` one negative undirected edge is a
    negative CYCLE: the relax loop would burn all ``max_iter`` supersteps
    and return silently wrong distances.

    ``max_dist`` gives the reference's bounded-exploration
    IncompleteDijkstra semantics (cpp/graph/IncompleteDijkstra.cpp:10-64:
    the heap-driven loop simply never expands settled nodes beyond the
    bound): nodes at distance > max_dist are neither returned nor
    expanded, so the frontier — and every per-round shuffle — stays
    proportional to the bounded ball rather than the component. With
    non-negative weights, pruning relaxed distances > max_dist is exact
    for every node within the bound (any prefix of a shortest path is
    shorter than the whole)."""
    min_w = graph.edges.agg(F.min("weight")).collect()[0][0]
    if min_w is not None and float(min_w) < 0.0:
        raise ValueError(
            f"sssp_distances: negative edge weight {min_w} — Dijkstra "
            "semantics require non-negative weights"
        )
    sym = graph.sym_part(cols=("src", "dst", "weight")).persist()
    sym.count()
    dist = (
        graph.nodes()
        .filter(F.col("node") == source)
        .select("node", F.lit(0.0).alias("dist"))
        .transform(_cc)
    )
    changed = dist
    while max_iter > 0:
        max_iter -= 1
        relax = (
            sym.join(changed, sym.src == changed.node)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("weight")).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if max_dist is not None:
            relax = relax.filter(F.col("dist") <= float(max_dist))
        merged = (
            dist.unionByName(relax).groupBy("node").agg(F.min("dist").alias("dist"))
        ).transform(_cc)
        changed = (
            merged.alias("a")
            .join(dist.alias("b"), "node", "left")
            .filter(F.col("b.dist").isNull() | (F.col("a.dist") < F.col("b.dist")))
            .select("node", F.col("a.dist").alias("dist"))
            .transform(_cc)
        )
        dist = merged
        if changed.isEmpty():
            break
    sym.unpersist()
    return dist


def eccentricity(graph: Graph, source: int) -> int:
    """Eccentricity.cpp: max BFS distance from source."""
    d = bfs_distances(graph, source)
    return int(d.agg(F.max("dist")).collect()[0][0] or 0)


def _anf_init(graph: Graph, num_sketches: int, seed: int, hash_fn: str = "xxhash"):
    """Per-node FM bitmask columns m0..m{k-1}; geometric bit position from a
    deterministic hash (no task-order rand): u ~ Uniform(0,1) from
    hash(node, sketch, seed); pos = floor(-log2 u); bit i set with prob
    2^-(i+1) per EffectiveDiameterApproximation.cpp:46-56.

    ``hash_fn="md5"`` uses the portable md5-based hash60 (same value in
    DuckDB) so the sketch propagation is exactly reproducible by the SQL
    oracle; ``"xxhash"`` is the cheaper JVM-side default.
    """
    from ..functions.dedup import hash60

    nodes = graph.nodes()
    masks = []
    for s in range(num_sketches):
        if hash_fn == "md5":
            h = hash60(F.concat_ws(":", F.col("node"), F.lit(s), F.lit(seed)))
        else:
            h = F.abs(F.xxhash64("node", F.lit(s), F.lit(seed)))
        u = (h % F.lit(2**52)).cast("double") / F.lit(float(2**52))
        pos = F.least(
            F.floor(-F.log2(F.greatest(u, F.lit(1e-15)))).cast("int"), F.lit(61)
        )
        # 2^pos with a column exponent (shiftleft needs a literal); powers of
        # two are exact in double up to 2^61
        masks.append(F.pow(F.lit(2.0), pos.cast("double")).cast("long").alias(f"m{s}"))
    return nodes.select("node", *masks).transform(_cc)


def _anf_or_step(sym, cur, num_sketches: int):
    """One ANF hop: OR each node's masks with its neighbors' (per-hop
    ``groupBy(node).agg(bit_or)`` — the distributed analog of the
    reference's per-hop neighbor OR, EffectiveDiameterApproximation.cpp)."""
    nbr = sym.join(cur, sym.src == cur.node).groupBy(F.col("dst").alias("node")).agg(
        *[F.bit_or(f"m{s}").alias(f"n{s}") for s in range(num_sketches)]
    )
    return (
        cur.join(nbr, "node", "left")
        .select(
            "node",
            *[
                F.col(f"m{s}").bitwiseOR(F.coalesce(F.col(f"n{s}"), F.lit(0))).alias(f"m{s}")
                for s in range(num_sketches)
            ],
        )
        .transform(_cc)
    )


def anf_sketch_stats(
    graph: Graph,
    num_sketches: int = 4,
    hops: int = 8,
    seed: int = 42,
    hash_fn: str = "md5",
) -> "DataFrame":
    """Integer-exact view of the ANF propagation: per hop, the total FM
    lowest-zero-bit count ``Σ_nodes Σ_sketches lzb(mask)`` — a pure-integer
    statistic of the same distributed sketch state that
    :func:`neighborhood_function_anf` estimates |N_h| from, so it is
    hash-exact reproducible by an unrolled SQL oracle (the float
    ``2^b/0.77351`` estimate is libm-dependent; the sketches are not).
    Returns (hop, lzb_total) for hops 1..``hops``, fixed, no early break.
    """
    spark = graph.edges.sparkSession
    sym = graph.sym_part().persist()
    sym.count()
    cur = _anf_init(graph, num_sketches, seed, hash_fn=hash_fn)
    lzb = sum(
        (
            F.bit_count(F.col(f"m{s}").bitwiseXOR(F.col(f"m{s}") + 1)) - 1
            for s in range(num_sketches)
        ),
        F.lit(0),
    ).cast("long")
    rows = []
    for hop in range(1, hops + 1):
        cur = _anf_or_step(sym, cur, num_sketches)
        total = cur.agg(F.sum(lzb).alias("t")).collect()[0]["t"]
        rows.append((hop, int(total or 0)))
    sym.unpersist()
    return spark.createDataFrame(rows, "hop int, lzb_total long")


def neighborhood_function_anf(
    graph: Graph, num_sketches: int = 8, max_hops: int = 32, seed: int = 42
) -> list:
    """ANF / Flajolet-Martin neighborhood function
    (EffectiveDiameterApproximation.cpp:13-120): per node keep ``num_sketches``
    FM bitmasks; bit i set with prob 2^-(i+1); per hop OR over neighbors;
    estimate |N_h| from mean lowest-zero-bit b as 2^b / 0.77351.

    Deterministic: the random bit comes from xxhash64(node, sketch) — no
    task-order dependence. Returns [(hop, estimated_reachable_pairs)].
    """
    cur = _anf_init(graph, num_sketches, seed, hash_fn="xxhash")
    sym = graph.sym_part().persist()

    # per-node reach estimate: b = mean lowest-zero-bit over sketches,
    # est(u) = 2^b / 0.77351; lowest-zero-bit = #trailing ones =
    # bit_count(m XOR (m+1)) - 1
    def est_col():
        bs = [
            (F.bit_count(F.col(f"m{s}").bitwiseXOR(F.col(f"m{s}") + 1)) - 1)
            for s in range(num_sketches)
        ]
        mean_b = sum(bs, F.lit(0)).cast("double") / F.lit(float(num_sketches))
        return F.pow(F.lit(2.0), mean_b) / F.lit(0.77351)

    results = []
    est_prev = None
    for hop in range(1, max_hops + 1):
        cur = _anf_or_step(sym, cur, num_sketches)
        est = cur.select(est_col().alias("e")).agg(F.sum("e")).collect()[0][0] or 0.0
        results.append((hop, float(est)))
        if est_prev is not None and abs(est - est_prev) < 1e-9 * max(est, 1.0):
            break
        est_prev = est
    sym.unpersist()
    return results


def effective_diameter_sketch_grid(
    graph: Graph,
    ratio: float = 0.9,
    num_sketches: int = 4,
    hops: int = 8,
    seed: int = 42,
    grid: int = 1 << 20,
) -> float:
    """Cross-engine-exact ANF effective diameter
    (EffectiveDiameterApproximation.cpp semantics, fixed ``hops`` unroll):
    the portable md5 FM sketches (as in :func:`anf_sketch_stats`), with each
    node's reach estimate 2^mean_b / 0.77351 snapped to a 1/``grid`` integer
    lattice (floor(est·grid + 0.5) as BIGINT) BEFORE the per-hop sum — the
    per-hop totals are then integers, immune to float summation order, and
    an external engine reproduces them bit-exactly (the only float step,
    pow(2, k/S) with dyadic k/S, is sub-half-ulp-identical across IEEE
    libms; a lattice flip would need the product to land within ~1e-12 of a
    half-integer). The smallest hop reaching ``ratio`` of the final total is
    linearly interpolated exactly like :func:`effective_diameter_approx`."""
    cur = _anf_init(graph, num_sketches, seed, hash_fn="md5")
    sym = graph.sym_part().persist()

    bs = [
        (F.bit_count(F.col(f"m{s}").bitwiseXOR(F.col(f"m{s}") + 1)) - 1)
        for s in range(num_sketches)
    ]
    mean_b = sum(bs, F.lit(0)).cast("double") / F.lit(float(num_sketches))
    est_grid = F.floor(
        F.pow(F.lit(2.0), mean_b) / F.lit(0.77351) * F.lit(float(grid)) + F.lit(0.5)
    ).cast("long")

    totals = []
    for _ in range(hops):
        cur = _anf_or_step(sym, cur, num_sketches)
        totals.append(
            int(cur.select(est_grid.alias("e")).agg(F.sum("e")).collect()[0][0] or 0)
        )
    sym.unpersist()
    final = totals[-1]
    target = ratio * final
    prev_h, prev_v = 0, 0
    for h, v in enumerate(totals, start=1):
        if v >= target:
            if v == prev_v:
                return float(h)
            return prev_h + (target - prev_v) / (v - prev_v)
        prev_h, prev_v = h, v
    return float(hops)


def hop_plot_approx(graph: Graph, **kw) -> list:
    """HopPlotApproximation: fraction of reachable pairs per hop distance,
    normalized by the final (fixpoint) estimate — same ANF machinery
    (reference cpp/distance/HopPlotApproximation.cpp)."""
    nf = neighborhood_function_anf(graph, **kw)
    if not nf:
        return []
    final = nf[-1][1]
    if final <= 0:
        return [(h, 0.0) for h, _ in nf]
    return [(h, v / final) for h, v in nf]


def multi_source_bfs(graph: Graph, sources: list[int], max_iter: int = 10_000) -> DataFrame:
    """Batched multi-source BFS: ONE level-synchronous frontier of
    (source, node) pairs for ALL sources at once — |sources| BFS trees cost
    one BFS's worth of supersteps (max eccentricity rounds), not
    |sources| serial loops. Returns (source, node, dist) for reached pairs.

    This is the same pair-frontier shape as effective_diameter_exact; state
    is O(reachable pairs) = |sources|·n, partitioned like any edge join."""
    spark = graph.edges.sparkSession
    if not sources:
        return spark.createDataFrame([], "source long, node long, dist int")
    sym = graph.sym_part().persist()
    sym.count()
    src_df = spark.createDataFrame(
        [(int(s),) for s in sources], "source long"
    )
    nodes = graph.nodes()
    dist = (
        nodes.join(src_df, nodes.node == src_df.source)
        .select("source", "node", F.lit(0).alias("dist"))
        .transform(_cc)
    )
    frontier = dist
    hop = 0
    while max_iter > 0:
        max_iter -= 1
        hop += 1
        reach = (
            sym.join(frontier, sym.src == frontier.node)
            .select("source", F.col("dst").alias("node"), F.lit(hop).alias("dist"))
            .distinct()
        )
        new = reach.join(dist, ["source", "node"], "left_anti").transform(_cc)
        if new.isEmpty():
            break
        dist = dist.unionByName(new).transform(_cc)
        frontier = new
    sym.unpersist()
    return dist


def apsp_sampled(graph: Graph, sources: list[int]) -> DataFrame:
    """APSP analog restricted to sampled sources (n× BFS is the reference
    APSP.cpp; at scale only source samples are meaningful). Returns
    (source, node, dist) via ONE batched multi-source BFS."""
    return multi_source_bfs(graph, sources)


def effective_diameter_exact(graph: Graph, ratio: float = 0.9) -> float:
    """EffectiveDiameter (exact, small graphs): run multi-source BFS from ALL
    nodes at once (level-synchronous pair counting) and return the smallest
    hop where >= ratio of reachable pairs are covered
    (reference cpp/distance/EffectiveDiameter.cpp). O(n*m) work — use the
    ANF variant beyond test scale."""
    sym = graph.sym_part().persist()
    nodes = graph.nodes()
    # pair frontier (source, node); memory O(reachable pairs) — small graphs
    dist = nodes.select(F.col("node").alias("source"), "node", F.lit(0).alias("dist"))
    dist = dist.transform(_cc)
    frontier = dist
    counts = [dist.count()]
    hop = 0
    while True:
        hop += 1
        reach = (
            sym.join(frontier, sym.src == frontier.node)
            .select("source", F.col("dst").alias("node"), F.lit(hop).alias("dist"))
            .distinct()
        )
        new = reach.join(dist, ["source", "node"], "left_anti").transform(_cc)
        if new.isEmpty():
            break
        dist = dist.unionByName(new).transform(_cc)
        frontier = new
        counts.append(counts[-1] + new.count())
    sym.unpersist()
    total = counts[-1]
    target = ratio * total
    for h, c in enumerate(counts):
        if c >= target:
            if h == 0:
                return 0.0
            prev = counts[h - 1]
            return (h - 1) + (target - prev) / (c - prev)
    return float(len(counts) - 1)


def effective_diameter_approx(graph: Graph, ratio: float = 0.9, **kw) -> float:
    """EffectiveDiameterApproximation.cpp: smallest hop h where the
    neighborhood function reaches ``ratio`` of its final value (with linear
    interpolation between hops, matching the reference's estimate shape)."""
    nf = neighborhood_function_anf(graph, **kw)
    if not nf:
        return 0.0
    final = nf[-1][1]
    target = ratio * final
    prev_h, prev_v = 0, 0.0
    for h, v in nf:
        if v >= target:
            if v == prev_v:
                return float(h)
            return prev_h + (target - prev_v) / (v - prev_v)
        prev_h, prev_v = h, v
    return float(nf[-1][0])


def neighborhood_function_heuristic(
    graph: Graph, num_samples: int = 64, seed: int = 42
) -> list:
    """NeighborhoodFunctionHeuristic (reference
    cpp/distance/NeighborhoodFunctionHeuristic.cpp:35-100): estimate the
    neighborhood function N(h) = #ordered pairs within distance <= h by
    running BFS from a node sample and scaling per-distance counts by
    n/#samples. The reference's endpoint corrections are applied: N(1) = 2m
    exactly; the final hop is pinned to n*(n-1) (connected-graph assumption,
    same as the reference's).

    Sources are a seeded hash-sample (reproducible analog of the reference's
    RANDOM strategy); the BFS is the batched multi-source pair frontier, so
    the sample costs one BFS's worth of supersteps. The per-distance
    histogram is diameter-sized — collected to the driver like the
    reference's result vector.
    """
    n = graph.num_nodes()
    m = graph.num_edges()
    srcs = [
        r["node"]
        for r in graph.nodes()
        .orderBy(F.abs(F.xxhash64("node", F.lit(seed))), F.asc("node"))
        .limit(num_samples)
        .collect()
    ]
    if not srcs:
        return []
    pairs = multi_source_bfs(graph, srcs)
    hist = {
        r["dist"]: r["cnt"]
        for r in pairs.filter(F.col("dist") > 0)
        .groupBy("dist")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    if not hist:
        return []
    # the endpoint is pinned at the EXACT diameter, like the reference's
    # `Diameter diam(G); result.resize(dia)` (NeighborhoodFunctionHeuristic
    # .cpp:36-47) — the max SAMPLED distance underestimates dia whenever no
    # sampled source is an extremal node, which would truncate the function
    # and claim total coverage hops too early
    from ..operators.misc import diameter_exact

    dia = max(diameter_exact(graph), max(hist))
    norm = n / float(len(srcs))
    # Endpoint corrections + accumulation exactly as the reference
    # (NeighborhoodFunctionHeuristic.cpp:72-95): result[0] = 2m anchors the
    # cumulative chain (result[dist-1] = round(count*norm) + result[dist-2]),
    # each hop's sampled count is rounded BEFORE accumulating with C++
    # half-away-from-zero semantics (floor(x+0.5) — Python round() is
    # banker's and diverges on half-integers), and the final hop is pinned
    # to n*(n-1). This keeps the returned function monotone from the exact
    # h=1 value onward.
    out = [(1, int(2 * m))]
    acc = float(2 * m)
    for h in range(2, dia + 1):
        if h == dia:
            out.append((h, int(n * (n - 1))))
        else:
            acc += math.floor(hist.get(h, 0) * norm + 0.5)
            out.append((h, int(acc)))
    return out


def bfs_sample(graph: Graph, source: int, k: int = 50) -> Graph:
    """bfsSample (reference networkit/sampling.py:5-26): node-induced
    subgraph of the source PLUS up to ``k`` discovered nodes (the reference
    counts only *discovered* nodes against ``k``, so the sample has at most
    ``k + 1`` members). The reference's FIFO discovery order is
    schedule-dependent; the deterministic distributed analog takes the
    ``k + 1`` smallest (dist, node) pairs — same level structure, ties broken
    by node id. TakeOrdered (orderBy+limit) — distributed, no global
    window."""
    dist = bfs_distances(graph, source)
    closest = (
        dist.orderBy(F.asc("dist"), F.asc("node")).limit(k + 1).select("node")
    )
    return graph.subgraph_from_nodes(closest)


def graph_distance(graph: Graph, u: int, v: int) -> float:
    """Single-pair distance dispatch (reference cpp/graph/GraphDistance.cpp
    :12-36 ``weightedDistance``/``unweightedDistance``): BFS hop count on
    unweighted graphs, Dijkstra on weighted ones — exactly the reference's
    branch. Returns +inf when ``v`` is unreachable from ``u`` (the
    reference's ``none``/infinite-distance convention)."""
    dist = (
        sssp_distances(graph, u) if graph.weighted else bfs_distances(graph, u)
    )
    row = dist.filter(F.col("node") == v).collect()
    return float(row[0]["dist"]) if row else float("inf")
