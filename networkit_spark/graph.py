"""Edge-DataFrame graph model — the relational dual of NetworKit's adjacency
lists (reference: /root/reference/networkit/cpp/graph/Graph.h:79, which stores
per-node in/out adjacency vectors with parallel weight arrays).

Canonical logical model: an edge DataFrame ``(src BIGINT, dst BIGINT,
weight DOUBLE)``. Undirected graphs keep ONE canonical copy per edge
(``src <= dst``); ``Graph.sym()`` materializes both orientations for
neighborhood gathers, mirroring Graph.h:109's both-endpoint storage.
Unweighted graphs carry ``weight = 1.0`` (Globals.h:29 defaultEdgeWeight).

Node ids are dense 0-based BIGINTs (Globals.h:23 ``node = uint64_t``); the
node set is either an explicit ``spark.range(n)`` (isolated nodes exist, as in
the reference where ``z`` bounds the id space) or derived from edge endpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EDGE_COLS = ("src", "dst", "weight")


class Graph:
    """Immutable logical graph over an edge DataFrame.

    Mirrors NetworKit's ``Graph(n, weighted, directed)`` constructor surface
    (Graph.h:365) minus mutation: Spark graphs are rebuilt, not mutated —
    ``add_edges``/``remove_edges`` return new Graphs (append/anti-join).
    """

    def __init__(
        self,
        edges: DataFrame,
        directed: bool = False,
        weighted: bool = False,
        num_nodes: int | None = None,
    ):
        cols = edges.columns
        if "weight" not in cols:
            edges = edges.withColumn("weight", F.lit(1.0))
        self.edges = edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("weight").cast("double"),
        )
        self.directed = directed
        self.weighted = weighted
        self._num_nodes = num_nodes
        self._spark: SparkSession = edges.sparkSession

    # -- construction ------------------------------------------------------
    @classmethod
    def from_edge_list(
        cls,
        spark: SparkSession,
        edge_list,
        directed: bool = False,
        weighted: bool = False,
        num_nodes: int | None = None,
    ) -> "Graph":
        """Build from a python list of (u, v) or (u, v, w) tuples (test fixtures)."""
        rows = [
            (int(e[0]), int(e[1]), float(e[2]) if len(e) > 2 else 1.0)
            for e in edge_list
        ]
        df = spark.createDataFrame(rows, "src long, dst long, weight double")
        if not directed:
            df = df.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            ).dropDuplicates(["src", "dst"])
        return cls(df, directed=directed, weighted=weighted, num_nodes=num_nodes)

    # -- views -------------------------------------------------------------
    def sym(self) -> DataFrame:
        """Both-orientation edge view: the gather-side adjacency.

        Directed graphs return edges as-is; undirected graphs union the
        reverse orientation (self-loops appear once, matching the reference's
        single storage of u-u loops).
        """
        if self.directed:
            return self.edges
        rev = self.edges.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return self.edges.unionByName(rev)

    def sym_part(
        self,
        key: str = "src",
        cols: tuple = ("src", "dst"),
        num_partitions: "int | None" = None,
    ) -> DataFrame:
        """:meth:`sym` hash-partitioned by the frontier-join key.

        Iterative operators join the (big, loop-invariant) adjacency against
        an O(frontier) state frame every round. Stats-clean checkpointed
        state frames (plans/ckpt.py) carry no size statistics, so the static
        planner can't broadcast them — without a pinned layout every round's
        join re-shuffles all m edge rows. Partitioned once by the join key,
        the adjacency side of each round's shuffled hash join satisfies
        ENSURE_REQUIREMENTS from cache and only the frontier moves — the
        same layout rule as PageRank's pre-partitioned transition
        (operators/pagerank.py:_transition). Callers ``persist()`` the
        result; ``num_partitions`` defaults to the session parallelism.
        """
        if num_partitions is None:
            num_partitions = self.edges.sparkSession.sparkContext.defaultParallelism
        d = self.sym().select(*cols)
        return d.repartition(num_partitions, key) if num_partitions else d

    def nodes(self) -> DataFrame:
        if self._num_nodes is not None:
            return self._spark.range(self._num_nodes).withColumnRenamed("id", "node")
        return (
            self.edges.select(F.col("src").alias("node"))
            .unionByName(self.edges.select(F.col("dst").alias("node")))
            .distinct()
        )

    def num_nodes(self) -> int:
        if self._num_nodes is not None:
            return self._num_nodes
        return self.nodes().count()

    def num_edges(self) -> int:
        return self.edges.count()

    # -- degree primitives (Graph.h:567-601) -------------------------------
    def degrees(self) -> DataFrame:
        """(node, degree): out-degree for directed, incident count undirected."""
        deg = self.sym().groupBy(F.col("src").alias("node")).agg(
            F.count("*").alias("degree")
        )
        return self.nodes().join(deg, "node", "left").select(
            "node", F.coalesce("degree", F.lit(0)).alias("degree")
        )

    def in_degrees(self) -> DataFrame:
        src = self.edges if self.directed else self.sym()
        deg = src.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_degree"))
        return self.nodes().join(deg, "node", "left").select(
            "node", F.coalesce("in_degree", F.lit(0)).alias("in_degree")
        )

    def weighted_degrees(self) -> DataFrame:
        """(node, wdeg): sum of incident/out edge weights — the PageRank
        divisor (reference PageRank.cpp:30-33)."""
        deg = self.sym().groupBy(F.col("src").alias("node")).agg(
            F.sum("weight").alias("wdeg")
        )
        return self.nodes().join(deg, "node", "left").select(
            "node", F.coalesce("wdeg", F.lit(0.0)).alias("wdeg")
        )

    # -- scalar aggregates (Graph.h:726,745,879) ---------------------------
    def total_edge_weight(self) -> float:
        row = self.edges.agg(F.sum("weight").alias("w")).collect()[0]
        return float(row["w"] or 0.0)

    def number_of_self_loops(self) -> int:
        return self.edges.filter(F.col("src") == F.col("dst")).count()

    def density(self) -> float:
        n = self.num_nodes()
        m = self.num_edges()
        if n < 2:
            return 0.0
        pairs = n * (n - 1) if self.directed else n * (n - 1) / 2
        return m / pairs

    # -- transforms (Graph.h:556,930-945) ----------------------------------
    def transpose(self) -> "Graph":
        return Graph(
            self.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"),
            directed=self.directed,
            weighted=self.weighted,
            num_nodes=self._num_nodes,
        )

    def to_undirected(self) -> "Graph":
        und = self.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        ).groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
        return Graph(und, directed=False, weighted=self.weighted, num_nodes=self._num_nodes)

    def to_unweighted(self) -> "Graph":
        return Graph(
            self.edges.select("src", "dst", F.lit(1.0).alias("weight")),
            directed=self.directed,
            weighted=False,
            num_nodes=self._num_nodes,
        )

    def subgraph_from_nodes(self, nodes_df: DataFrame) -> "Graph":
        """Induced subgraph — two semi-joins (reference Graph.h:556)."""
        nn = nodes_df.select(F.col(nodes_df.columns[0]).alias("node"))
        kept = (
            self.edges.join(nn.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(nn.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst", "weight")
        )
        return Graph(kept, directed=self.directed, weighted=self.weighted)

    def remove_self_loops(self) -> "Graph":
        return Graph(
            self.edges.filter(F.col("src") != F.col("dst")),
            directed=self.directed,
            weighted=self.weighted,
            num_nodes=self._num_nodes,
        )

    def add_edges(self, other: DataFrame) -> "Graph":
        return Graph(
            self.edges.unionByName(other.select(*EDGE_COLS)),
            directed=self.directed,
            weighted=self.weighted,
            num_nodes=self._num_nodes,
        )

    def remove_edges(self, other: DataFrame) -> "Graph":
        return Graph(
            self.edges.join(other.select("src", "dst"), ["src", "dst"], "left_anti"),
            directed=self.directed,
            weighted=self.weighted,
            num_nodes=self._num_nodes,
        )

    def merge(self, other: "Graph", offset: int | None = None) -> "Graph":
        """Disjoint union (Graph.h:544-551 append): offset other's ids."""
        if offset is None:
            offset = self.num_nodes()
        shifted = other.edges.select(
            (F.col("src") + offset).alias("src"),
            (F.col("dst") + offset).alias("dst"),
            "weight",
        )
        return Graph(
            self.edges.unionByName(shifted),
            directed=self.directed,
            weighted=self.weighted or other.weighted,
        )

    def index_edges(self) -> DataFrame:
        """(src, dst, weight, edge_id) — Graph::indexEdges analog; ids are a
        deterministic hash, not sequence-dependent (partitioning-independent)."""
        return self.edges.withColumn("edge_id", F.xxhash64("src", "dst"))

    def has_edge(self, u: int, v: int) -> bool:
        e = self.sym() if not self.directed else self.edges
        return e.filter((F.col("src") == u) & (F.col("dst") == v)).limit(1).count() > 0
