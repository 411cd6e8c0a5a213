"""Distributed Laplacian smoothing and the operators built on it:
effective resistance, commute-time distance, spanning-edge centrality.

Reference: cpp/distance/CommuteTimeDistance.cpp:33-64 (exact mode: per node
pair solve ``L x = e_u - e_v`` with the LAMG multigrid solver, distance =
``|x_u - x_v|``; ``runApproximation`` :71+ uses JL sketching) and
cpp/centrality/SpanningEdgeCentrality.cpp:35-63 (per edge solve, score =
``|x_u - x_v|`` = the edge's effective resistance; ``runApproximation`` :69+
solves for ``k = ceil(log2 n)/eps^2`` random ±1/sqrt(k) sign vectors).

The reference leans on LAMG — a sequential multigrid setup that has no
distributed analog here. Spark-first replacement: **batched damped-Jacobi
relaxation**

    x  <-  (1 - omega) * x  +  omega * (b + A x) / d

which is one SpMV superstep per sweep — exactly the PageRank shuffle shape
(the symmetrized adjacency is pre-partitioned by ``src`` and cached once;
only the O(#systems * n) state vector moves per sweep). All right-hand sides
are solved TOGETHER in one state DataFrame keyed by ``sys``, so k systems
cost one solve's worth of supersteps, not k serial solves (same batching as
``multi_source_bfs``).

Correctness notes:
- ``L = D - A`` is singular (nullspace = constants). Every quantity exposed
  here is a DIFFERENCE ``x[u] - x[v]``, which is invariant under the
  nullspace, so no pinning/projection is needed.
- Damping ``omega < 1`` keeps the non-constant modes of the iteration matrix
  strictly inside the unit disc (plain Jacobi oscillates on bipartite
  structure); omega = 0.5 is unconditionally safe.
- Fixed ``iters`` makes the computation deterministic and exactly
  reproducible by an unrolled SQL oracle; convergence for *accuracy* is the
  caller's choice of ``iters`` (hundreds for exact parity with a dense
  pseudo-inverse on small graphs).

Scale: state is ``#systems * n`` rows hash-partitioned like any node vector.
At web scale, batch the systems (q sign vectors, or a window of pairs) so the
state fits the executors — the adjacency side is cached once regardless.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..plans.ckpt import clean_local_checkpoint as _cc
from ..plans.iterate import _free_checkpoint_blocks
from ..functions.dedup import hash60


def _sym_cached(graph: Graph, num_partitions: Optional[int]) -> DataFrame:
    if num_partitions is None:
        num_partitions = graph.edges.sparkSession.sparkContext.defaultParallelism
    sym = graph.sym().select("src", "dst", "weight")
    if num_partitions:
        sym = sym.repartition(num_partitions, "src")
    sym = sym.persist()
    sym.count()
    return sym


def laplacian_smooth(
    graph: Graph,
    rhs: DataFrame,
    iters: int = 100,
    omega: float = 0.5,
    num_partitions: Optional[int] = None,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Damped-Jacobi relaxation toward ``L x = b`` for every system in
    ``rhs`` (``(sys, node, b)``; nodes absent from a system's rows get
    ``b = 0``). Returns ``(sys, node, x)`` after ``iters`` sweeps from
    ``x = 0``.

    Isolated nodes (degree 0) keep ``x = 0`` — their Laplacian row is zero,
    so any value is consistent; zero matches the reference's zero-init
    solution vector (CommuteTimeDistance.cpp:44).

    Lineage is truncated by an eager ``localCheckpoint`` every
    ``checkpoint_every`` sweeps. Keep this SMALL (default 2): each un-truncated
    sweep nests three more operators into the logical plan and Catalyst's
    analysis/codegen cost grows super-linearly with plan depth — measured on
    the sf0.01 gate fixture, 24 sweeps cost 337 s at cadence 8 vs 16 s at
    cadence 2 (the shuffles are identical; the difference is pure
    planning + task-binary overhead).
    """
    sym = _sym_cached(graph, num_partitions)
    wdeg = sym.groupBy("src").agg(F.sum("weight").alias("d")).withColumnRenamed(
        "src", "node"
    )
    sys_ids = rhs.select("sys").distinct()
    state = (
        graph.nodes()
        .crossJoin(sys_ids)
        .join(wdeg, "node", "left")
        .join(rhs, ["sys", "node"], "left")
        .select(
            "sys",
            "node",
            F.coalesce("b", F.lit(0.0)).alias("b"),
            F.coalesce("d", F.lit(0.0)).alias("d"),
            F.lit(0.0).alias("x"),
        )
        .transform(_cc)
    )
    prev = None
    for i in range(iters):
        ax = (
            sym.join(state, sym.src == state.node)
            .groupBy("sys", "dst")
            .agg(F.sum(F.col("weight") * F.col("x")).alias("ax"))
            .withColumnRenamed("dst", "node")
        )
        new = state.join(ax, ["sys", "node"], "left").select(
            "sys",
            "node",
            "b",
            "d",
            F.when(
                F.col("d") > 0,
                (1.0 - omega) * F.col("x")
                + omega * (F.col("b") + F.coalesce("ax", F.lit(0.0))) / F.col("d"),
            )
            .otherwise(F.col("x"))
            .alias("x"),
        )
        if i % checkpoint_every == checkpoint_every - 1 or i == iters - 1:
            new = new.transform(_cc)
            if prev is not None:
                _free_checkpoint_blocks(prev)
            prev = new
        state = new
    sym.unpersist()
    return state.select("sys", "node", "x")


def conjugate_gradient(
    graph: Graph,
    rhs: DataFrame,
    iters: int = 50,
    tol: float = 1e-10,
    num_partitions: Optional[int] = None,
    safeguard: bool = False,
) -> DataFrame:
    """Diagonal-preconditioned Conjugate Gradient on the graph Laplacian,
    batched over systems (reference cpp/numerics/ConjugateGradient.h:68-106
    solve loop; DiagonalPreconditioner). ``rhs`` is ``(sys, node, b)``;
    returns ``(sys, node, x)``.

    Per iteration: ONE adjacency SpMV shuffle (the PageRank shape — cached
    pre-partitioned ``sym``, only the O(#systems·n) state moves) plus two
    O(#systems)-row scalar aggregates (alpha's denominator, then the
    residual pair), mirroring the reference's two inner products per
    iteration. CG converges in O(sqrt(cond)) supersteps vs damped Jacobi's
    O(cond) — for the Laplacian solves behind effective resistance /
    commute time this is the scale path; Jacobi stays the default where the
    unrolled-SQL oracle needs a fixed contraction schedule.

    Valid on the singular Laplacian when every ``b`` sums to zero per
    system (all callers pass ``e_u - e_v`` differences): the Krylov space
    then stays orthogonal to the constant nullspace. Early exit when every
    system's ||r||^2 <= tol^2 * ||b||^2 (reference's relative residual,
    ConjugateGradient.h:72).

    Superstep budget: the inner-product scalars (alpha's ``p·Ap``
    denominator, beta's residual ratio) are IN-PLAN broadcast aggregates
    over the previous iteration's cached state — never driver collects —
    so each CG iteration costs exactly TWO materializations (the SpMV
    state and the x/r update) and, at ``tol=0`` (the pinned-schedule
    oracle mode), zero driver round-trips; with a positive ``tol`` one
    small cached-side aggregate per iteration checks the residual. The
    search-direction update is folded lazily into the next iteration's
    SpMV plan. This roughly halves the scheduling-latency floor versus the
    collect-per-scalar formulation — the binding cost below ~10M edges.
    """
    from ..plans.ckpt import clean_local_checkpoint

    sym = _sym_cached(graph, num_partitions)
    wdeg = sym.groupBy("src").agg(F.sum("weight").alias("d")).withColumnRenamed(
        "src", "node"
    )
    sys_ids = rhs.select("sys").distinct()
    z0 = F.when(F.col("d") > 0, F.col("b") / F.col("d")).otherwise(F.lit(0.0))
    state = (
        graph.nodes()
        .crossJoin(sys_ids)
        .join(wdeg, "node", "left")
        .join(rhs, ["sys", "node"], "left")
        .select(
            "sys",
            "node",
            F.coalesce("b", F.lit(0.0)).alias("b"),
            F.coalesce("d", F.lit(0.0)).alias("d"),
            F.lit(0.0).alias("x"),
        )
        .withColumn("r", F.col("b"))
        .withColumn("p", z0)
        .transform(_cc)
    )

    def _rz_df(frame: DataFrame) -> DataFrame:
        # rz = r · (D^-1 r), the preconditioned residual inner product
        return frame.groupBy("sys").agg(
            F.sum(
                F.when(F.col("d") > 0, F.col("r") * F.col("r") / F.col("d")).otherwise(
                    0.0
                )
            ).alias("rz")
        )

    # per-system ||b||^2 — used by the positive-tol early exit AND by the
    # breakdown guard below (rz <= thresh·bb means the system is converged;
    # iterating past that point divides by a noise-level residual norm /
    # near-zero p·Ap and amplifies rounding chaotically — freeze alpha/beta
    # to 0 instead, making convergence a fixed point). thresh=1e-28 is
    # mirrored EXACTLY in the unrolled SQL oracle (_cg_ctes); callers that
    # may run far past the Krylov dimension and need robustness over
    # bit-parity (maxent_stress) pass ``safeguard=True`` → freeze earlier
    # at 1e-14·bb, before the tiny-p·Ap breakdown regime.
    bb_df = _cc(state.groupBy("sys").agg(F.sum(F.col("b") * F.col("b")).alias("bb")))
    thresh = 1e-14 if safeguard else 1e-28
    bb = (
        {row["sys"]: float(row["bb"]) for row in bb_df.collect()}
        if tol > 0
        else None
    )
    prev_rz_src = state  # cached frame whose (r, d) give the CURRENT rz
    live: list = []  # superseded checkpoints still referenced by lazy plans
    for _ in range(iters):
        ap_n = (
            sym.join(state, sym.src == state.node)
            .groupBy("sys", "dst")
            .agg(F.sum(F.col("weight") * F.col("p")).alias("apn"))
            .withColumnRenamed("dst", "node")
        )
        st = state.join(ap_n, ["sys", "node"], "left").withColumn(
            "ap", F.col("d") * F.col("p") - F.coalesce("apn", F.lit(0.0))
        )
        st = clean_local_checkpoint(st)
        # alpha = rz / (p·Ap) per system, as a broadcast-joined aggregate
        # (both sides are cached frames — the aggs run as cheap subjobs
        # inside the next materialization, no driver sync)
        pap_df = st.groupBy("sys").agg(F.sum(F.col("p") * F.col("ap")).alias("pap"))
        a_df = (
            _rz_df(prev_rz_src)
            .join(pap_df, "sys")
            .join(bb_df, "sys")
            .select(
                "sys",
                F.when(
                    (F.col("pap") > 0) & (F.col("rz") > thresh * F.col("bb")),
                    F.col("rz") / F.col("pap"),
                )
                .otherwise(F.lit(0.0))
                .alias("alpha"),
            )
        )
        st2 = st.join(F.broadcast(a_df), "sys").select(
            "sys",
            "node",
            "b",
            "d",
            (F.col("x") + F.col("alpha") * F.col("p")).alias("x"),
            (F.col("r") - F.col("alpha") * F.col("ap")).alias("r"),
            "p",
        )
        st2 = clean_local_checkpoint(st2)
        # beta = rz_new / rz_old, again in-plan over the two cached states
        b_df = (
            _rz_df(st2)
            .withColumnRenamed("rz", "rzn")
            .join(_rz_df(prev_rz_src), "sys")
            .join(bb_df, "sys")
            .select(
                "sys",
                F.when(
                    F.col("rz") > thresh * F.col("bb"),
                    F.col("rzn") / F.col("rz"),
                )
                .otherwise(F.lit(0.0))
                .alias("beta"),
            )
        )
        znew = F.when(F.col("d") > 0, F.col("r") / F.col("d")).otherwise(F.lit(0.0))
        # search-direction update stays LAZY — it folds into the next
        # iteration's SpMV materialization
        new_state = st2.join(F.broadcast(b_df), "sys").select(
            "sys",
            "node",
            "b",
            "d",
            "x",
            "r",
            (znew + F.col("beta") * F.col("p")).alias("p"),
        )
        # st2's plan referenced prev_rz_src (alpha/beta aggs) and st; both
        # are now baked into the materialized st2 — but new_state's lazy
        # beta still reads prev_rz_src and st2, so free with one-iteration
        # delay
        for old in live:
            _free_checkpoint_blocks(old)
        # prev_rz_src is the initial state on iteration 1 — it is superseded
        # exactly like any later one (new_state's lazy beta is the last
        # reader, materialized by the NEXT iteration's st), so it joins the
        # delayed free list unconditionally
        live = [st, prev_rz_src]
        prev_rz_src = st2
        state = new_state
        if tol > 0:
            res = {
                row["sys"]: float(row["rr"])
                for row in st2.groupBy("sys")
                .agg(F.sum(F.col("r") * F.col("r")).alias("rr"))
                .collect()
            }
            if all(res[s] <= tol * tol * bb.get(s, 0.0) for s in res):
                break
    sym.unpersist()
    return state.select("sys", "node", "x")


def _pairs_df(graph: Graph, pairs) -> DataFrame:
    spark = graph.edges.sparkSession
    if isinstance(pairs, DataFrame):
        # pin the assigned ids: monotonically_increasing_id depends on the
        # physical partition layout, and the solver + the final join each
        # evaluate this frame in separate jobs — an unpinned id could pair
        # (u, v) with another pair's solution vector
        return _cc(
            pairs.select(
                F.col("u").cast("long"), F.col("v").cast("long")
            ).withColumn("sys", F.monotonically_increasing_id())
        )
    rows = [(int(u), int(v), i) for i, (u, v) in enumerate(pairs)]
    return spark.createDataFrame(rows, "u long, v long, sys long")


def effective_resistance(
    graph: Graph,
    pairs,
    iters: int = 200,
    omega: float = 0.5,
    num_partitions: Optional[int] = None,
    checkpoint_every: int = 2,
    method: str = "jacobi",
    tol: float = 0.0,
) -> DataFrame:
    """Effective resistance ``R(u, v) = (e_u - e_v)^T L^+ (e_u - e_v)`` for
    each pair, all pairs batched into one smoothing run. Returns
    ``(u, v, resistance)``.

    Matches CommuteTimeDistance.cpp:48-59 semantics: one linear system per
    pair with rhs ``e_u - e_v``; the answer is ``|x_u - x_v|``.

    ``method="cg"`` swaps the damped-Jacobi sweeps for the preconditioned
    Conjugate Gradient (reference's actual solver family): far fewer
    supersteps at equal accuracy (O(sqrt(cond)) vs O(cond)) — use it at
    scale; ``iters`` then caps CG iterations.
    """
    p = _pairs_df(graph, pairs)
    rhs = p.select("sys", F.col("u").alias("node"), F.lit(1.0).alias("b")).unionByName(
        p.select("sys", F.col("v").alias("node"), F.lit(-1.0).alias("b"))
    )
    if method == "cg":
        x = conjugate_gradient(
            graph, rhs, iters=iters, tol=tol, num_partitions=num_partitions
        )
    else:
        x = laplacian_smooth(
            graph, rhs, iters=iters, omega=omega, num_partitions=num_partitions,
            checkpoint_every=checkpoint_every,
        )
    xu = x.select("sys", F.col("node").alias("u"), F.col("x").alias("xu"))
    xv = x.select("sys", F.col("node").alias("v"), F.col("x").alias("xv"))
    return (
        p.join(xu, ["sys", "u"]).join(xv, ["sys", "v"])
        .select("u", "v", F.abs(F.col("xu") - F.col("xv")).alias("resistance"))
    )


def commute_time_distance(
    graph: Graph,
    pairs,
    iters: int = 200,
    omega: float = 0.5,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Commute-time distance per pair: ``C(u, v) = vol(G) * R(u, v)`` with
    ``vol = sum of weighted degrees`` (2W). Returns
    ``(u, v, resistance, commute_time)``.

    Reference CommuteTimeDistance.cpp:57 stores the resistance
    (``|x_u - x_v|``) per pair; the commute-time scaling ``vol * R`` is the
    standard identity the class name refers to — both columns are exposed.
    """
    vol = graph.sym().agg(F.sum("weight")).collect()[0][0] or 0.0
    er = effective_resistance(
        graph, pairs, iters=iters, omega=omega, num_partitions=num_partitions
    )
    return er.select(
        "u", "v", "resistance", (F.lit(float(vol)) * F.col("resistance")).alias("commute_time")
    )


def spanning_edge_centrality(
    graph: Graph,
    q: int = 8,
    iters: int = 200,
    omega: float = 0.5,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Approximate spanning-edge centrality (per-edge effective resistance)
    via Johnson-Lindenstrauss sketching: solve ``L z_i = B^T W^{1/2} q_i``
    for ``q`` deterministic ±1/sqrt(q) sign vectors ``q_i`` (one entry per
    edge), then ``R(u, v) ≈ Σ_i (z_i[u] - z_i[v])^2``. Returns
    ``(src, dst, score)`` over the canonical edge set.

    Mirrors SpanningEdgeCentrality.cpp:69-110 (runApproximation) with two
    deliberate deviations: signs come from the portable md5-based ``hash60``
    (deterministic and reproducible by the SQL oracle — the reference uses a
    host RNG), and the rhs carries ``sqrt(weight)`` so the weighted case is
    correct (the reference marks its weighted handling TODO at :58).

    All ``q`` systems solve together in ONE batched smoothing run: the
    dominant cost is q-independent (the cached adjacency side of each SpMV).
    """
    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst", "weight")
    sys_df = spark.range(q).withColumnRenamed("id", "sys")
    signed = (
        edges.crossJoin(sys_df)
        .select(
            "sys",
            "src",
            "dst",
            (
                (
                    F.when(
                        F.pmod(
                            hash60(
                                F.concat_ws(":", F.col("src"), F.col("dst"), F.col("sys"))
                            ),
                            F.lit(2),
                        )
                        == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0))
                )
                * F.sqrt("weight")
                / F.lit(float(q) ** 0.5)
            ).alias("r"),
        )
    )
    rhs = (
        signed.select("sys", F.col("src").alias("node"), F.col("r").alias("b"))
        .unionByName(signed.select("sys", F.col("dst").alias("node"), (-F.col("r")).alias("b")))
        .groupBy("sys", "node")
        .agg(F.sum("b").alias("b"))
    )
    z = laplacian_smooth(graph, rhs, iters=iters, omega=omega, num_partitions=num_partitions)
    zu = z.select("sys", F.col("node").alias("src"), F.col("x").alias("zu"))
    zv = z.select("sys", F.col("node").alias("dst"), F.col("x").alias("zv"))
    return (
        edges.select("src", "dst")
        .join(zu, "src")
        .join(zv, ["sys", "dst"])
        .groupBy("src", "dst")
        .agg(
            F.sum((F.col("zu") - F.col("zv")) * (F.col("zu") - F.col("zv"))).alias(
                "score"
            )
        )
    )
