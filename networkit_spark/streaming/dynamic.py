"""Incremental single-source shortest paths under edge events — the
reference's DynBFS / DynDijkstra / DynSSSP surface.

Reference: /root/reference/networkit/cpp/graph/DynBFS.cpp (BFS distances
maintained under GraphEvent batches), cpp/graph/DynDijkstra.cpp (weighted,
priority-queue re-relaxation of the affected cone), cpp/graph/DynSSSP.h
(the shared update(events) contract).

Distributed mapping (Ramalingam–Reps style, expressed relationally):

* state is the ``(node, dist)`` DataFrame of the previous answer;
* EDGE_ADDITIONS can only *improve* distances → seed a relax frontier with
  every addition head whose tentative distance drops;
* EDGE_REMOVALS can only *worsen* distances, and only for nodes whose
  shortest-path tree used a removed edge → compute the affected cone as the
  forward closure of the removed edges' heads over the OLD shortest-path
  DAG (edges u→v with dist[u] + w == dist[v]), drop those entries, and
  re-relax from the intact boundary.

Both phases are frontier joins: total cost is proportional to the affected
region's size and hop-radius, not the graph — the same asymptotic win the
reference gets from its affected-vertex coloring (DynBFS.cpp's mod-growth
queue), and the whole point of the Dyn* family versus recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc
from .graph_events import apply_events


def _relax_loop(
    sym: DataFrame, dist: DataFrame, frontier: DataFrame, max_iter: int = 10_000
) -> DataFrame:
    """Bellman-Ford supersteps restricted to a seed frontier: repeatedly
    relax out-edges of changed nodes; only improvements propagate. ``dist``
    must already be correct for every node outside the frontier's cone."""
    dist = dist.transform(_cc)
    frontier = frontier.transform(_cc)
    while max_iter > 0 and not frontier.isEmpty():
        max_iter -= 1
        cand = (
            sym.join(frontier, sym.src == frontier.node)
            .select(F.col("dst").alias("node"),
                    (F.col("dist") + F.col("weight")).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        improved = (
            cand.join(dist.withColumnRenamed("dist", "old"), "node", "left")
            .filter(F.col("old").isNull() | (F.col("dist") < F.col("old")))
            .select("node", "dist")
            .transform(_cc)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.select("node"), "node", "left_anti")
            .unionByName(improved)
            .transform(_cc)
        )
        frontier = improved
    return dist


class DynSSSP:
    """DynDijkstra/DynBFS analog: exact single-source distances maintained
    incrementally under event batches.  ``weighted=False`` gives DynBFS hop
    counts (every weight treated as 1), ``weighted=True`` DynDijkstra.

    Usage::

        d = DynSSSP(graph, source=0, weighted=False)
        d.update(event_batch_df)   # GraphEvent rows, EVENT_SCHEMA
        d.distances                # (node, dist) DataFrame
    """

    def __init__(self, graph: Graph, source: int, weighted: bool | None = None):
        self.weighted = graph.weighted if weighted is None else weighted
        self.source = source
        self.graph = graph
        self.distances = self._from_scratch(graph)

    def _sym(self, graph: Graph) -> DataFrame:
        # src-partitioned so _relax_loop's per-round frontier join reuses the
        # cached layout (see Graph.sym_part)
        s = graph.sym_part(cols=("src", "dst", "weight"))
        if not self.weighted:
            s = s.select("src", "dst", F.lit(1.0).alias("weight"))
        return s

    def _from_scratch(self, graph: Graph) -> DataFrame:
        spark = graph.edges.sparkSession
        seed = spark.createDataFrame(
            [(int(self.source), 0.0)], "node long, dist double"
        )
        # persist the adjacency for the relax supersteps (sym_part's
        # contract: callers persist) — otherwise every Bellman-Ford round
        # re-reads and re-shuffles all m edges
        sym = self._sym(graph).persist()
        try:
            return _relax_loop(sym, seed, seed)
        finally:
            sym.unpersist()

    def update(self, events: DataFrame) -> DataFrame:
        """Fold an event batch into the graph and repair distances
        incrementally.  Returns the new (node, dist) DataFrame."""
        old_edges = self.graph.edges
        new_edges = apply_events(
            old_edges.select("src", "dst", "weight"),
            events,
            directed=self.graph.directed,
        ).transform(_cc)
        new_graph = Graph(
            new_edges, directed=self.graph.directed, weighted=self.graph.weighted
        )
        old_sym = self._sym(self.graph)
        new_sym = self._sym(new_graph).persist()
        dist = self.distances

        # --- removal phase: invalidate the affected cone -------------------
        removed = old_sym.join(new_sym, ["src", "dst", "weight"], "left_anti")
        du = dist.select(F.col("node").alias("src"), F.col("dist").alias("du"))
        dv = dist.select(F.col("node").alias("dst"), F.col("dist").alias("dv"))
        # heads of removed edges that the old SP-DAG actually used
        broken = (
            removed.join(du, "src").join(dv, "dst")
            .filter(F.col("du") + F.col("weight") == F.col("dv"))
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        if not broken.isEmpty():
            # forward closure over the OLD SP-DAG (conservative over-
            # invalidation is fine; each round is one frontier join)
            sp_dag = (
                old_sym.join(du, "src").join(dv, "dst")
                .filter(F.col("du") + F.col("weight") == F.col("dv"))
                .select("src", "dst")
                .persist()
            )
            affected = broken.transform(_cc)
            frontier = affected
            while not frontier.isEmpty():
                nxt = (
                    sp_dag.join(frontier, sp_dag.src == frontier.node)
                    .select(F.col("dst").alias("node"))
                    .distinct()
                    .join(affected, "node", "left_anti")
                    .transform(_cc)
                )
                affected = affected.unionByName(nxt).transform(_cc)
                frontier = nxt
            sp_dag.unpersist()
            affected = affected.filter(F.col("node") != self.source)
            dist = dist.join(affected, "node", "left_anti")
            # boundary: intact nodes with an edge into the affected cone
            boundary = (
                new_sym.join(affected.withColumnRenamed("node", "dst"), "dst",
                             "left_semi")
                .select(F.col("src").alias("node"))
                .distinct()
                .join(dist, "node")  # keeps only still-valid nodes + their dist
            )
            dist = _relax_loop(new_sym, dist, boundary)

        # --- addition phase: relax from improved heads ---------------------
        added = new_sym.join(old_sym, ["src", "dst", "weight"], "left_anti")
        du = dist.select(F.col("node").alias("src"), F.col("dist").alias("du"))
        dv = dist.select(F.col("node").alias("dst"), F.col("dist").alias("dv"))
        improved = (
            added.join(du, "src").join(dv, "dst", "left")
            .filter(F.col("dv").isNull()
                    | (F.col("du") + F.col("weight") < F.col("dv")))
            .groupBy("dst")
            .agg(F.min(F.col("du") + F.col("weight")).alias("dist"))
            .select(F.col("dst").alias("node"), "dist")
        )
        if not improved.isEmpty():
            dist = (
                dist.join(improved.select("node"), "node", "left_anti")
                .unionByName(improved)
            )
            dist = _relax_loop(new_sym, dist, improved)

        new_sym.unpersist()
        self.graph = new_graph
        self.distances = dist.transform(_cc)
        return self.distances


class DynBFS(DynSSSP):
    """DynBFS (cpp/graph/DynBFS.cpp): hop-count specialization."""

    def __init__(self, graph: Graph, source: int):
        super().__init__(graph, source, weighted=False)


class DynDijkstra(DynSSSP):
    """DynDijkstra (cpp/graph/DynDijkstra.cpp): weighted specialization."""

    def __init__(self, graph: Graph, source: int):
        super().__init__(graph, source, weighted=True)


class DynApproxBetweenness:
    """Approximate betweenness maintained under event batches — the
    reference's DynApproxBetweenness surface
    (cpp/centrality/DynApproxBetweenness.cpp: sampled dependencies updated
    only where the batch touched a sample's shortest-path structure).

    Granularity: affected-SAMPLE recomputation. A sampled source s is
    affected iff some changed edge can alter its SP DAG:

    * an added edge (u,v,w) with d_s(u)+w <= d_s(v) (creates a shorter or
      additional shortest path — sigma changes even on ties), or v unseen;
    * a removed edge that was TIGHT in the old DAG (d_s(u)+w == d_s(v)).

    Affected sources rerun the batched Brandes sweep
    (operators/centrality.py brandes_dependencies) on the new graph — all
    affected sources in ONE multi-source pass; unaffected sources keep
    their old (source, node, delta) rows untouched. The reference
    repairs per-sample path samples in-place; sample-level recomputation
    gives identical OUTPUT (our estimator is the per-source Brandes sum,
    so post-update scores equal betweenness_sampled on the new graph —
    asserted in tests/test_dynamic_betweenness.py) while every superstep
    stays a distributed frontier join.
    """

    def __init__(self, graph: Graph, sources: list[int]):
        from ..operators.centrality import brandes_dependencies

        self.graph = graph
        self.sources = [int(s) for s in sources]
        self.deps = brandes_dependencies(graph, self.sources)
        self.dist = None  # (source, node, dist) cache of the current graph
        self._refresh_dist(graph)
        self.last_affected: list[int] = []

    def _refresh_dist(self, graph: Graph, only_sources: list[int] | None = None):
        from ..operators.distance import multi_source_bfs

        fresh = multi_source_bfs(graph, only_sources or self.sources)
        if only_sources is None or self.dist is None:
            self.dist = fresh.transform(_cc)
        else:
            keep = self.dist.filter(~F.col("source").isin(only_sources))
            self.dist = keep.unionByName(fresh).transform(_cc)

    def _affected_sources(self, added: DataFrame, removed: DataFrame) -> list[int]:
        du = self.dist.select("source", F.col("node").alias("src"),
                              F.col("dist").alias("du"))
        dv = self.dist.select("source", F.col("node").alias("dst"),
                              F.col("dist").alias("dv"))
        hit_add = (
            added.join(du, "src")
            .join(dv, ["source", "dst"], "left")
            .filter(F.col("dv").isNull() | (F.col("du") + 1 <= F.col("dv")))
            .select("source")
        )
        hit_rem = (
            removed.join(du, "src")
            .join(dv, ["source", "dst"])
            .filter(F.col("du") + 1 == F.col("dv"))
            .select("source")
        )
        rows = hit_add.unionByName(hit_rem).distinct().collect()
        return sorted(int(r["source"]) for r in rows)

    def update(self, events: DataFrame) -> None:
        from ..operators.centrality import brandes_dependencies

        old_sym = self.graph.sym().select("src", "dst").distinct()
        new_edges = apply_events(
            self.graph.edges.select("src", "dst", "weight"),
            events,
            directed=self.graph.directed,
        ).transform(_cc)
        new_graph = Graph(
            new_edges, directed=self.graph.directed, weighted=self.graph.weighted
        )
        new_sym = new_graph.sym().select("src", "dst").distinct().persist()
        added = new_sym.join(old_sym, ["src", "dst"], "left_anti")
        removed = old_sym.join(new_sym, ["src", "dst"], "left_anti")
        # hop-count betweenness: presence changes matter in BOTH directions
        added = added.unionByName(
            added.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        removed = removed.unionByName(
            removed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()

        affected = self._affected_sources(added, removed)
        self.last_affected = affected
        if affected:
            fresh = brandes_dependencies(new_graph, affected)
            keep = self.deps.filter(~F.col("source").isin(affected))
            self.deps = keep.unionByName(fresh).transform(_cc)
            self._refresh_dist(new_graph, affected)
        new_sym.unpersist()
        self.graph = new_graph

    def scores(self) -> DataFrame:
        """(node, score): summed sampled dependencies, same estimator as
        operators.centrality.betweenness_sampled."""
        out = self.deps.groupBy("node").agg(F.sum("delta").alias("score"))
        return self.graph.nodes().join(out, "node", "left").select(
            "node", F.coalesce("score", F.lit(0.0)).alias("score")
        )


class DynPageRank:
    """Incremental PageRank under GraphEvent batches — warm-started power
    iteration (Spark-first extension; the reference's Dyn* family stops at
    distances/betweenness). The previous score vector seeds the iteration on
    the post-event transition (operators/pagerank.pagerank ``init_scores``):
    after a batch touching a small fraction of edges the iterate starts
    within O(‖Δ‖) of the new fixpoint, so convergence needs the few
    supersteps of that residual's geometric decay instead of a cold start's
    full log(tol)/log(damp) — the same affected-region economics as DynSSSP,
    in spectral form. Exactness is unconditional: the damped power iteration
    contracts to the UNIQUE stationary vector from any normalized start, so
    the warm answer equals a from-scratch run at the same tolerance.

    Usage::

        d = DynPageRank(graph, damp=0.85, tol=1e-9)
        d.update(event_batch_df)   # GraphEvent rows, EVENT_SCHEMA
        d.scores                   # (node, score) DataFrame, sums to 1
    """

    def __init__(self, graph: Graph, damp: float = 0.85, tol: float = 1e-9):
        from ..operators.pagerank import pagerank

        self.graph = graph
        self.damp = damp
        self.tol = tol
        self.scores = pagerank(graph, damp=damp, tol=tol)
        self.iterations = getattr(self.scores, "_iterations", None)

    def update(self, events: DataFrame) -> DataFrame:
        from ..operators.pagerank import pagerank

        new_edges = apply_events(
            self.graph.edges.select("src", "dst", "weight"),
            events,
            directed=self.graph.directed,
        ).transform(_cc)
        self.graph = Graph(
            new_edges, directed=self.graph.directed, weighted=self.graph.weighted
        )
        self.scores = pagerank(
            self.graph, damp=self.damp, tol=self.tol, init_scores=self.scores
        )
        self.iterations = getattr(self.scores, "_iterations", None)
        return self.scores
