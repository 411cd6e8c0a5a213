"""Max-flow / min-cut (Edmonds-Karp) and flow-based CutClustering.

Reference: /root/reference/networkit/cpp/flow/EdmondsKarp.cpp:18-95 (BFS
shortest augmenting paths on the residual graph of an undirected capacity
graph; ``getSourceSet`` = residual-reachable side of the min cut) and
cpp/community/CutClustering.cpp:16-80 (Flake-Tarjan-Tsioutsiouliklis cut
clustering: augment with a sink ``t`` joined to every node at weight
``alpha``; each uncovered node's cluster is the source side of its min
``u``-``t`` cut, processed in descending-degree order).

Spark shape
-----------
The residual graph is an arc DataFrame ``(u, v, r)`` (two arcs per
undirected edge, ``r(u,v) + r(v,u) == 2w`` invariant). Each BFS *wave* is a
distributed frontier join over arcs with ``r > 0`` — at web scale a wave is
a full shuffle-join exactly like ``bfs_distances``. Edmonds-Karp's
*augmentation sequence* is inherently sequential (each path must observe
the previous path's residuals) — same as the reference, whose run() is a
serial while-loop; it is kept as the parity path. The scale path is
bulk-synchronous push-relabel (:func:`push_relabel`), and its batched form
(:func:`push_relabel_batched`) runs MANY independent flow systems
concurrently over sys-keyed state — CutClustering uses it to replace the
reference's serial per-node loop (CutClustering.cpp:63-78) with waves of
concurrent flows while replaying the assignment in the reference's
descending-degree order (the nested-cut property makes the *apply* order
load-bearing, not the *compute* order: every cut is computed on the
original augmented graph).

The min-cut value and the inclusion-minimal source side are UNIQUE across
all maximum flows (max-flow/min-cut duality + submodularity), so tests pin
them exactly; per-arc flows are only unique where the fixture forces them
(as in the reference's own assertions, EdmondsKarpGTest.cpp:31-33,70).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc

_EPS = 1e-12


@dataclass
class FlowResult:
    """Outcome of ``edmonds_karp``: max-flow value, residual arcs
    ``(u, v, r)``, and the min-cut source side ``(node)``."""

    flow_value: float
    residual: DataFrame
    source_set: DataFrame

    def flows(self) -> DataFrame:
        """Per-arc net flow ``(u, v, flow)``, positive direction only
        (EdmondsKarp.cpp getFlow semantics up to forced uniqueness)."""
        return self.residual.select(
            "u", "v", F.greatest(F.col("cap") - F.col("r"), F.lit(0.0)).alias("flow")
        ).filter(F.col("flow") > _EPS)


def _residual_arcs(graph: Graph) -> DataFrame:
    """Residual arc table ``(u, v, cap, r)``.

    Undirected: two arcs per edge, each at full capacity (a capacity-w
    undirected edge is flow-equivalent to antiparallel w-arcs). Directed:
    the forward arcs at capacity plus explicit cap-0 REVERSE arcs — the
    residual-update joins are LEFT joins onto existing arc rows, so without
    the reverse rows a directed graph could never cancel flow (the +gain
    deltas would be silently dropped). Self-loops are removed (they can
    carry no s-t flow and would double-key the init-preflow delta join);
    parallel arcs collapse into one row by summing capacity."""
    sym = graph.sym()
    arcs = sym.select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("weight").cast("double").alias("cap"),
    )
    if graph.directed:
        arcs = arcs.unionByName(
            sym.select(
                F.col("dst").alias("u"),
                F.col("src").alias("v"),
                F.lit(0.0).alias("cap"),
            )
        )
    return (
        arcs.filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("cap").alias("cap"))
        .withColumn("r", F.col("cap"))
    )


def _bfs_residual(spark, resid: DataFrame, source: int, sink: int):
    """One BFS over arcs with r > 0. Returns (reached DataFrame
    (node, pred, gain), sink_row or None). Pred choice is deterministic
    (max gain, then min pred) so results are partitioning-independent."""
    reached = spark.createDataFrame(
        [(source, source, float("inf"))], "node long, pred long, gain double"
    ).transform(_cc)
    frontier = reached
    depth = 0
    while True:
        depth += 1
        step = (
            resid.filter(F.col("r") > _EPS)
            .join(F.broadcast(frontier), F.col("u") == F.col("node"))
            .select(
                F.col("v").alias("nnode"),
                F.col("u").alias("npred"),
                F.least(F.col("gain"), F.col("r")).alias("ngain"),
            )
            .groupBy("nnode")
            .agg(F.max(F.struct("ngain", (-F.col("npred")).alias("neg"))).alias("m"))
            .select(
                F.col("nnode").alias("node"),
                (-F.col("m.neg")).alias("pred"),
                F.col("m.ngain").alias("gain"),
            )
        )
        # no broadcast hint on the growing reached set (it approaches n);
        # the per-wave frontier is the bounded side
        new = step.join(
            reached.select("node"), "node", "left_anti"
        ).transform(_cc)
        if new.isEmpty():
            return reached, None
        reached = reached.unionByName(new).transform(_cc)
        hit = new.filter(F.col("node") == sink).collect()
        if hit:
            return reached, hit[0]
        frontier = new


def _backtrack(reached_rows: dict, source: int, sink: int) -> list:
    """Path arcs (u, v) from source to sink following preds."""
    path = []
    cur = sink
    while cur != source:
        pred = reached_rows[cur]
        path.append((pred, cur))
        cur = pred
    path.reverse()
    return path


def edmonds_karp(graph: Graph, source: int, sink: int, max_augment: int = 100_000) -> FlowResult:
    """Max flow from ``source`` to ``sink`` (EdmondsKarp.cpp:54-95).

    Each augmentation: distributed BFS over positive-residual arcs, then a
    driver backtrack of the single path over the collected pred map — that
    collect is bounded by ONE BFS's reached set (O(n) worst case, 2 narrow
    columns), which is what keeps this the documented community-scale
    parity path; :func:`push_relabel_batched` is the corpus-scale path with
    no per-augmentation driver round-trip. Terminates when the sink is
    unreachable; the reached set of that final BFS is the canonical min-cut
    source side (EdmondsKarp.cpp getSourceSet)."""
    spark = graph.edges.sparkSession
    resid = _residual_arcs(graph).transform(_cc)
    flow_value = 0.0

    for _ in range(max_augment):
        reached, sink_row = _bfs_residual(spark, resid, source, sink)
        if sink_row is None:
            source_set = reached.select("node")
            return FlowResult(
                flow_value=flow_value, residual=resid, source_set=source_set
            )
        # driver-side pred map for the path only: collect is bounded by the
        # reached set of ONE bfs; the path itself is O(depth)
        pred_map = {r["node"]: r["pred"] for r in reached.collect()}
        gain = float(sink_row["gain"])
        path = _backtrack(pred_map, source, sink)
        flow_value += gain
        upd = spark.createDataFrame(
            [(u, v, -gain) for u, v in path] + [(v, u, gain) for u, v in path],
            "u long, v long, delta double",
        )
        resid = (
            resid.join(F.broadcast(upd), ["u", "v"], "left")
            .select(
                "u",
                "v",
                "cap",
                (F.col("r") + F.coalesce("delta", F.lit(0.0))).alias("r"),
            )
            .transform(_cc)
        )
    raise RuntimeError("edmonds_karp: max_augment exceeded")


def _global_heights(
    spark, arcs: DataFrame, state: DataFrame, src_df: DataFrame, sink: int, n: int
) -> DataFrame:
    """Global relabeling heuristic, batched over systems: exact residual BFS
    distances computed as ONE (sys, phase)-keyed multi-source BFS over each
    system's reversed positive-residual arcs — phase 't' from the sink
    (h = dist-to-sink) and phase 's' from that system's source (h = n +
    dist-to-source for nodes that cannot reach the sink). Heights are only
    ever RAISED (max with the current label): any valid labeling lower-bounds
    both exact distances, so taking the max keeps the labeling valid and
    monotone — the standard termination/correctness arguments are untouched,
    while pushes now route along shortest residual paths."""
    rev = arcs.filter(F.col("r") > _EPS).select(
        "sys", F.col("v").alias("a"), F.col("u").alias("b")
    ).transform(_cc)
    dist = (
        src_df.select(
            "sys",
            F.col("source").alias("node"),
            F.lit("s").alias("phase"),
            F.lit(0).alias("d"),
        )
        .unionByName(
            src_df.select(
                "sys",
                F.lit(sink).alias("node"),
                F.lit("t").alias("phase"),
                F.lit(0).alias("d"),
            )
        )
        .transform(_cc)
    )
    frontier = dist
    while True:
        step = (
            rev.join(
                F.broadcast(frontier.select("sys", F.col("node").alias("a"), "phase", "d")),
                ["sys", "a"],
            )
            .select("sys", F.col("b").alias("node"), "phase", (F.col("d") + 1).alias("d"))
            .groupBy("sys", "node", "phase")
            .agg(F.min("d").alias("d"))
        )
        new = step.join(
            dist.select("sys", "node", "phase"), ["sys", "node", "phase"], "left_anti"
        ).transform(_cc)
        if new.isEmpty():
            break
        dist = dist.unionByName(new).transform(_cc)
        frontier = new
    ht = dist.filter(F.col("phase") == "t").select("sys", "node", F.col("d").alias("dt"))
    hs = dist.filter(F.col("phase") == "s").select("sys", "node", F.col("d").alias("ds"))
    return (
        state.join(ht, ["sys", "node"], "left")
        .join(hs, ["sys", "node"], "left")
        .join(src_df, "sys")
        .select(
            "sys",
            "node",
            F.when(F.col("node") == F.col("source"), F.lit(n))
            .otherwise(
                F.greatest(
                    F.col("h"),
                    F.coalesce("dt", F.col("ds") + n, F.col("h")),
                )
            )
            .alias("h"),
            "e",
        )
    )


@dataclass
class BatchedFlowResult:
    """Outcome of ``push_relabel_batched``: per-system flow values
    ``(sys, flow)``, per-system min-cut source sides ``(sys, node)``, and the
    sys-keyed residual arcs ``(sys, u, v, cap, r)``."""

    flow_values: DataFrame
    source_sets: DataFrame
    residual: DataFrame


def _reachable_batched(arcs: DataFrame, src_df: DataFrame) -> DataFrame:
    """Per-system residual-reachable set ``(sys, node)`` from each system's
    source — one keyed BFS over positive-residual arcs for ALL systems."""
    reached = src_df.select("sys", F.col("source").alias("node")).transform(_cc)
    frontier = reached
    pos = arcs.filter(F.col("r") > _EPS).select(
        "sys", F.col("u").alias("node"), "v"
    ).transform(_cc)
    while True:
        step = (
            pos.join(F.broadcast(frontier), ["sys", "node"])
            .select("sys", F.col("v").alias("node"))
            .distinct()
        )
        new = step.join(reached, ["sys", "node"], "left_anti").transform(_cc)
        if new.isEmpty():
            return reached
        reached = reached.unionByName(new).transform(_cc)
        frontier = new


def push_relabel_batched(
    graph: Graph,
    sources: list,
    sink: int,
    max_rounds: int = 100_000,
    relabel_every: int = 3,
) -> BatchedFlowResult:
    """Max flow via bulk-synchronous push-relabel (Goldberg-Tarjan), batched
    over independent systems — the scale path that removes Edmonds-Karp's
    per-augmentation driver BFS. ``sources`` is ``[(sys, source_node), ...]``;
    all systems share the ``sink`` and run CONCURRENTLY over sys-keyed state
    ``(sys, node, h, e)`` and sys-keyed residual arcs ``(sys, u, v, cap, r)``
    (memory = #systems × m arc rows — the caller picks the wave size).

    Every superstep, ALL active nodes of ALL systems discharge concurrently
    (saturating/non-saturating pushes along their admissible arcs, allocated
    by a per-(sys, node) running sum) and every active node with no
    admissible arc relabels to 1 + min neighbor height. No driver
    round-trips inside a superstep; the only driver state is the combined
    active-node count. Every ``relabel_every`` rounds the global-relabeling
    heuristic (:func:`_global_heights`, itself sys-keyed) raises all heights
    to the exact residual BFS distances — the standard accelerant that makes
    pushes follow shortest residual paths. Systems that finish early simply
    have no active rows and contribute no work to later rounds.

    Concurrent-push safety (per system; systems never interact): a push
    needs h(u) = h(v) + 1, so u→v and v→u can never both be admissible in
    one superstep; pushes out of u are capped by u's excess via the
    running-sum allocation, and pushes INTO a node only raise its excess.
    Heights only rise (≤ 2n), giving the standard termination bound.
    """
    from pyspark.sql import Window

    spark = graph.edges.sparkSession
    n = graph.num_nodes()
    src_df = F.broadcast(
        spark.createDataFrame(
            [(int(s), int(u)) for s, u in sources], "sys long, source long"
        )
    )
    sys_ids = F.broadcast(
        spark.createDataFrame([(int(s),) for s, _ in sources], "sys long")
    )
    arcs = _residual_arcs(graph).crossJoin(sys_ids).select("sys", "u", "v", "cap", "r")

    # initial preflow: saturate every arc out of each system's source
    init = (
        arcs.join(src_df, "sys")
        .filter(F.col("u") == F.col("source"))
        .select("sys", "source", F.col("v").alias("node"), F.col("cap").alias("f"))
    )
    # arc update expressed as a delta join (same shape as each round's
    # update, including the same (sys,u,v) aggregation so no join key is
    # ever duplicated)
    deltas0 = (
        init.select(
            "sys", F.col("source").alias("u"), F.col("node").alias("v"), (-F.col("f")).alias("delta")
        )
        .unionByName(
            init.select(
                "sys", F.col("node").alias("u"), F.col("source").alias("v"), F.col("f").alias("delta")
            )
        )
        .groupBy("sys", "u", "v")
        .agg(F.sum("delta").alias("delta"))
    )
    arcs = (
        arcs.join(deltas0, ["sys", "u", "v"], "left")
        .select(
            "sys", "u", "v", "cap", (F.col("r") + F.coalesce("delta", F.lit(0.0))).alias("r")
        )
        .transform(_cc)
    )
    state = (
        graph.nodes()
        .crossJoin(sys_ids)
        .join(src_df, "sys")
        .join(init.select("sys", "node", "f"), ["sys", "node"], "left")
        .select(
            "sys",
            "node",
            F.when(F.col("node") == F.col("source"), F.lit(n)).otherwise(F.lit(0)).alias("h"),
            F.when(F.col("node") == F.col("source"), F.lit(0.0))
            .otherwise(F.coalesce("f", F.lit(0.0)))
            .alias("e"),
        )
        .transform(_cc)
    )

    def _active(st):
        return (
            st.join(src_df, "sys")
            .filter(
                (F.col("e") > _EPS)
                & (F.col("node") != F.col("source"))
                & (F.col("node") != sink)
            )
            .select("sys", "node", "h", "e")
        )

    for rnd in range(max_rounds):
        act = _active(state)
        if act.isEmpty():
            break
        if rnd % relabel_every == 0:
            state = _global_heights(spark, arcs, state, src_df, sink, n).transform(_cc)
            act = _active(state)
        pos = arcs.filter(F.col("r") > _EPS)
        hu = act.select(
            "sys", F.col("node").alias("u"), F.col("h").alias("hu"), F.col("e").alias("eu")
        )
        hv = state.select("sys", F.col("node").alias("v"), F.col("h").alias("hv"))
        cand = pos.join(hu, ["sys", "u"]).join(hv, ["sys", "v"])
        adm = cand.filter(F.col("hu") == F.col("hv") + 1)
        w = (
            Window.partitionBy("sys", "u")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        pushes = (
            adm.withColumn("before", F.coalesce(F.sum("r").over(w), F.lit(0.0)))
            .withColumn("p", F.least(F.col("r"), F.col("eu") - F.col("before")))
            .filter(F.col("p") > _EPS)
            .select("sys", "u", "v", "p")
            .transform(_cc)
        )
        # relabel: active nodes with NO admissible arc — EXCLUDING nodes that
        # receive a push this round. A receiver v gains a fresh reverse
        # residual arc (v, pusher); if v relabeled concurrently from its
        # pre-push arc set, the new arc could violate the height invariant
        # h(v) <= h(pusher) + 1 (the synchronous analog of the lock-free
        # push-relabel's atomicity requirement). Skipping receivers keeps
        # every relabel justified by arcs that still exist afterwards;
        # progress holds: a round with no pushes has no receivers, so every
        # stuck active node relabels.
        relabel = (
            cand.groupBy("sys", "u")
            .agg(
                F.min(F.when(F.col("hu") == F.col("hv") + 1, F.lit(0))).alias("has_adm"),
                F.min("hv").alias("min_hv"),
            )
            .filter(F.col("has_adm").isNull())
            .join(
                pushes.select("sys", F.col("v").alias("u")).distinct(),
                ["sys", "u"],
                "left_anti",
            )
            .select("sys", F.col("u").alias("node"), (F.col("min_hv") + 1).alias("new_h"))
        )
        arc_delta = (
            pushes.select("sys", "u", "v", (-F.col("p")).alias("delta"))
            .unionByName(
                pushes.select(
                    "sys", F.col("v").alias("u"), F.col("u").alias("v"), F.col("p").alias("delta")
                )
            )
            .groupBy("sys", "u", "v")
            .agg(F.sum("delta").alias("delta"))
        )
        arcs = (
            arcs.join(arc_delta, ["sys", "u", "v"], "left")
            .select(
                "sys", "u", "v", "cap", (F.col("r") + F.coalesce("delta", F.lit(0.0))).alias("r")
            )
            .transform(_cc)
        )
        e_delta = (
            pushes.select("sys", F.col("u").alias("node"), (-F.col("p")).alias("de"))
            .unionByName(pushes.select("sys", F.col("v").alias("node"), F.col("p").alias("de")))
            .groupBy("sys", "node")
            .agg(F.sum("de").alias("de"))
        )
        state = (
            state.join(e_delta, ["sys", "node"], "left")
            .join(relabel, ["sys", "node"], "left")
            .select(
                "sys",
                "node",
                F.coalesce("new_h", F.col("h")).alias("h"),
                (F.col("e") + F.coalesce("de", F.lit(0.0))).alias("e"),
            )
            .transform(_cc)
        )
    else:
        raise RuntimeError("push_relabel_batched: max_rounds exceeded")

    flow_values = state.filter(F.col("node") == sink).select(
        "sys", F.col("e").alias("flow")
    )
    return BatchedFlowResult(
        flow_values=flow_values,
        source_sets=_reachable_batched(arcs, src_df),
        residual=arcs,
    )


def push_relabel(
    graph: Graph,
    source: int,
    sink: int,
    max_rounds: int = 100_000,
    relabel_every: int = 3,
) -> FlowResult:
    """Single-system wrapper over :func:`push_relabel_batched` (sys = 0).
    Same FlowResult contract as :func:`edmonds_karp` (the min-cut source
    side — residual-reachable from s — is unique across all maximum flows,
    so both algorithms return identical values/cuts)."""
    b = push_relabel_batched(
        graph, [(0, source)], sink, max_rounds=max_rounds, relabel_every=relabel_every
    )
    rows = b.flow_values.collect()
    # sink absent from the node set: zero flow, like edmonds_karp
    flow_value = float(rows[0]["flow"]) if rows else 0.0
    return FlowResult(
        flow_value=flow_value,
        residual=b.residual.select("u", "v", "cap", "r"),
        source_set=b.source_sets.select("node"),
    )


def max_flow_value(graph: Graph, source: int, sink: int) -> float:
    return edmonds_karp(graph, source, sink).flow_value


def min_st_cut(graph: Graph, source: int, sink: int) -> DataFrame:
    """Inclusion-minimal source side of a minimum s-t cut: (node)."""
    return edmonds_karp(graph, source, sink).source_set


def cut_clustering(
    graph: Graph, alpha: float, method: str = "batched", batch: int = 16
) -> DataFrame:
    """Flake et al. cut clustering (CutClustering.cpp:16-80): (node, cluster)
    with cluster = the representative whose min-cut source side absorbed the
    node. Deterministic: nodes processed by (-degree, node id), matching the
    reference's descending-degree bucket sort (.cpp:37-61).

    ``method="batched"`` (default) runs the per-node max-flows in WAVES of
    ``batch`` systems through :func:`push_relabel_batched` — one concurrent
    sys-keyed push-relabel per wave instead of one driver-synchronized
    Edmonds-Karp per node. Semantically identical to the sequential loop:
    each node's min-cut source side is computed on the ORIGINAL augmented
    graph (order-independent), and the wave's cuts are applied in the same
    descending-degree order with the same skip-if-assigned /
    overwrite-unconditionally rules (a node assigned by an earlier cut in
    the same wave has its own precomputed cut discarded, exactly as the
    serial loop would never compute it). Wave memory is ``batch × m``
    residual-arc rows — tune ``batch`` to executor memory.

    Assignment replay is fully distributed: labels live in a (node,
    cluster, rank) DataFrame folded per wave — later ranks (the
    descending-degree processing order) overwrite via ``max_by`` inside a
    wave and an anti-join merge across waves; wave representatives are
    selected by an anti-join + ``limit(batch)`` against the label frame.
    The driver only ever materializes ``batch`` representative ids and the
    batch×batch within-wave rep-membership matrix per wave — never a node
    set or an O(n) dict. ``method="sequential"`` keeps the literal
    reference-shaped per-node Edmonds-Karp loop for parity tests."""
    from ..plans.ckpt import clean_local_checkpoint as _cc

    spark = graph.edges.sparkSession
    n_sink = int(graph.nodes().agg(F.max("node")).collect()[0][0]) + 1

    base = graph.edges.select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    )
    sink_edges = graph.nodes().select(
        F.col("node").alias("src"),
        F.lit(n_sink).alias("dst"),
        F.lit(float(alpha)).alias("weight"),
    )
    aug = Graph(
        base.unionByName(sink_edges), directed=False, weighted=True
    )

    if method == "sequential":
        degs = graph.degrees().collect()  # parity mode: reference-shaped loop
        order = [
            int(r["node"])
            for r in sorted(degs, key=lambda t: (-t["degree"], t["node"]))
        ]
        assigned: dict = {}
        for u in order:
            if u in assigned:
                continue
            res = edmonds_karp(aug, u, n_sink)
            for v in (int(r["node"]) for r in res.source_set.collect()):
                # reference overwrites unconditionally: a later cut may
                # absorb earlier clusters wholesale (CutClustering.cpp:72-76)
                assigned[v] = u
        return _labels_df(spark, assigned)

    # distributed precedence fold: rank = position in the reference's
    # descending-degree bucket order (CutClustering.cpp:37-61); exact global
    # rank via range-partitioned zip_with_rank — NOT a partitionBy-less
    # window, which would funnel all nodes through one partition
    from ..plans.order import zip_with_rank

    handle: list = []
    ranked = _cc(
        zip_with_rank(
            graph.degrees(),
            order_cols=(F.col("degree").desc(), F.col("node")),
            cache_handle=handle,
        ).select("node", "rank")
    ).persist()
    for h in handle:
        h.unpersist()
    labels = _cc(spark.createDataFrame([], "node long, cluster long, rank int"))
    while True:
        reps = (
            ranked.join(labels, "node", "left_anti")
            .orderBy("rank")
            .limit(batch)
            .collect()
        )
        if not reps:
            break
        wave = [(i, int(r["node"]), int(r["rank"])) for i, r in enumerate(reps)]
        b = push_relabel_batched(aug, [(i, u) for i, u, _ in wave], n_sink)
        sets = b.source_sets.persist()
        # within-wave liveness: rep u_i is live iff no EARLIER live rep's
        # source set contains it — needs only the batch×batch membership
        # matrix, not the sets themselves
        rep_nodes = spark.createDataFrame(
            [(u,) for _, u, _ in wave], "node long"
        )
        mem = {
            (int(r["sys"]), int(r["node"]))
            for r in sets.join(F.broadcast(rep_nodes), "node", "left_semi")
            .select("sys", "node")
            .collect()
        }
        live: list = []
        for i, u, rank in wave:
            if any((j, u) in mem for j, _, _ in live):
                continue  # absorbed by an earlier cut in this wave
            live.append((i, u, rank))
        sys_map = spark.createDataFrame(
            [(i, u, rank) for i, u, rank in live], "sys int, cluster long, rank int"
        )
        wave_labels = (
            sets.join(F.broadcast(sys_map), "sys")
            .groupBy("node")
            .agg(
                F.max_by("cluster", "rank").alias("cluster"),
                F.max("rank").alias("rank"),
            )
        )
        # later waves always carry larger ranks → overwrite on merge
        labels = _cc(
            labels.join(wave_labels, "node", "left_anti").unionByName(wave_labels)
        )
        sets.unpersist()
    ranked.unpersist()
    return labels.select("node", "cluster")


def _labels_df(spark, assigned: dict) -> DataFrame:
    return spark.createDataFrame(
        sorted(assigned.items()), "node long, cluster long"
    )


def _cluster_stats(graph: Graph, labels: dict) -> tuple:
    """Distributed per-cluster (sizes, cuts) for a clustering given as a
    node→cluster dict: cut[c] = Σ weight of edges leaving c (each edge
    contributes to BOTH endpoint clusters, matching the reference's
    forEdges accumulation, CutClustering.cpp:149-159)."""
    spark = graph.edges.sparkSession
    lab = F.broadcast(_labels_df(spark, labels))
    e = (
        graph.edges.join(lab.withColumnRenamed("node", "src")
                         .withColumnRenamed("cluster", "ca"), "src")
        .join(lab.withColumnRenamed("node", "dst")
              .withColumnRenamed("cluster", "cb"), "dst")
        .filter(F.col("ca") != F.col("cb"))
    )
    cuts = (
        e.select(F.col("ca").alias("c"), "weight")
        .unionByName(e.select(F.col("cb").alias("c"), "weight"))
        .groupBy("c").agg(F.sum("weight").alias("cut"))
    )
    cut_map = {int(r["c"]): float(r["cut"]) for r in cuts.collect()}
    sizes: dict = {}
    for c in labels.values():
        sizes[c] = sizes.get(c, 0) + 1
    return sizes, cut_map


def _cut_clustering_dict(graph: Graph, alpha: float) -> dict:
    return {
        int(r["node"]): int(r["cluster"])
        for r in cut_clustering(graph, alpha).collect()
    }


def cut_clustering_hierarchy(graph: Graph) -> dict:
    """Complete alpha hierarchy (CutClustering.cpp getClusterHierarchy:
    83-238): breakpoint search between the connected-components clustering
    (alpha=0) and all-singletons (alpha=upper), returning
    ``{alpha: {node: cluster}}`` with nested clusterings.

    Deviation from the reference: cluster representatives are the MINIMUM
    member id (the reference takes an arbitrary race winner / randomNode —
    the cluster CONTENTS are identical). Driver state is O(n) per level,
    the same as the reference's Partition vectors; every min-cut inside
    runs the distributed Edmonds-Karp.
    """
    import sys

    from .components import connected_components

    eps = sys.float_info.epsilon
    n_nodes = graph.num_nodes()
    upper = 2.0
    if graph.weighted:
        # reference floor: upper starts at 2 BEFORE maxing over weights
        # (CutClustering.cpp:85-92), so all-unit-weight graphs still get
        # upper = 3, keeping hierarchy alpha keys reference-identical
        upper = max(
            2.0,
            float(graph.edges.agg(F.max("weight")).collect()[0][0] or 1.0),
        ) + 1.0

    comp = connected_components(graph)
    reps = {
        int(r["node"]): int(r["component"]) for r in comp.collect()
    }  # component id IS the min member — the representative
    result: dict = {0.0: dict(reps)}
    n_comps = len(set(reps.values()))
    if n_comps > 1:
        whole_rep = min(reps)
        result[-1.0] = {u: whole_rep for u in reps}

    singletons = {u: u for u in reps}

    def recursion(lower, lower_clusters, upper_, upper_clusters):
        while True:
            middle = None
            lower_sizes, lower_cut = _cluster_stats(graph, lower_clusters)
            upper_sizes, upper_cut = _cluster_stats(graph, upper_clusters)
            for c in sorted(lower_sizes):
                if lower_sizes[c] == upper_sizes[upper_clusters[c]]:
                    continue
                upper_size = upper_sizes[upper_clusters[c]]
                lower_weight = lower_cut.get(c, 0.0)
                upper_weight = upper_cut.get(upper_clusters[c], 0.0)
                bp = (upper_weight - lower_weight) / (lower_sizes[c] - upper_size)
                # better breakpoint via upper-cluster representatives inside c
                for u in sorted(lower_clusters):
                    if (
                        lower_clusters[u] == c
                        and upper_clusters[u] == u
                        and u != c
                    ):
                        denom = lower_sizes[c] - upper_sizes[u]
                        tmp = (upper_cut.get(u, 0.0) - lower_weight) / denom
                        if tmp > bp:
                            bp = tmp
                if bp + eps < upper_:
                    middle = bp + eps
                    break

            if middle is None:
                result.setdefault(upper_, upper_clusters)
                return
            middle_clusters = _cut_clustering_dict(graph, middle)
            n_mid = len(set(middle_clusters.values()))
            if n_mid == len(set(lower_clusters.values())):
                raise RuntimeError(
                    "lower clustering equals middle clustering "
                    "(numerical inaccuracy, CutClustering.cpp:221)"
                )
            if n_mid == len(set(upper_clusters.values())):
                upper_ = middle
                result[upper_] = upper_clusters
            else:
                recursion(lower, lower_clusters, middle, middle_clusters)
                lower = middle
                lower_clusters = middle_clusters

    recursion(0.0, dict(reps), upper, singletons)
    return result
