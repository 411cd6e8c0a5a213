"""Dynamic graph generators — GraphEvent-stream *producers* feeding the
dynamics layer (streaming/dynamic.py, streaming/graph_events.py).

Reference:
- cpp/generators/DynamicDorogovtsevMendesGenerator.cpp:16-57 (seed triangle,
  then per step a new node wired to both endpoints of a random existing edge)
- cpp/generators/DynamicBarabasiAlbertGenerator.cpp:21-85 (k-node seed path,
  then per step a new node with k degree-proportional targets)
- cpp/generators/DynamicPathGenerator.cpp (path growth, trivial baseline)
- cpp/generators/DynamicPubWebGenerator.{h,cpp} (nodes drift on the unit
  torus; edges exist within a neighborhood radius — per step a diff of
  EDGE_ADDITION/EDGE_REMOVAL events)

These are *event producers* for test/simulation parity, mirroring the
reference's driver-sequential generators (each step's probabilities depend
on the running graph, so the recurrence is inherently sequential); the
emitted event DataFrame then feeds the fully distributed apply/DynBFS
machinery. Randomness is a seeded ``random.Random`` — the stream is a pure
function of (seed, steps), reproducible across runs and partitionings. For
corpus-scale synthetic graphs use the distributed static generators
(networkit_spark/generators.py); an event stream of comparable scale would
be produced by diffing table snapshots, not by a generator loop.

Event rows follow streaming/graph_events.py EVENT_SCHEMA:
``(seq, type, u, v, w, ts)`` with TIME_STEP markers separating steps.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from .graph_events import EVENT_SCHEMA

_EPOCH = "2020-01-01 00:00:00"


class _EventLog:
    """Accumulates GraphEvent rows with consecutive seq numbers and one
    timestamp tick per TIME_STEP (event-time for the streaming path)."""

    def __init__(self) -> None:
        self.rows: list = []
        self.seq = 0
        self.step = 0

    def _ts(self):
        import datetime

        base = datetime.datetime(2020, 1, 1)
        return base + datetime.timedelta(seconds=self.step)

    def emit(self, type_: str, u=None, v=None, w=None) -> None:
        self.rows.append((self.seq, type_, u, v, w, self._ts()))
        self.seq += 1
        if type_ == "TIME_STEP":
            self.step += 1

    def df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, EVENT_SCHEMA)


def dynamic_dorogovtsev_mendes_events(
    spark: SparkSession, steps: int, seed: int = 42
) -> DataFrame:
    """DynamicDorogovtsevMendesGenerator.cpp:20-53: seed triangle, then per
    step one new node joined to both endpoints of a uniformly random
    existing edge."""
    rng = random.Random(seed)
    log = _EventLog()
    edges: list[tuple[int, int]] = []
    for s in (0, 1, 2):
        log.emit("NODE_ADDITION", s)
    for a, b in ((0, 1), (1, 2), (2, 0)):
        edges.append((a, b))
        log.emit("EDGE_ADDITION", a, b, 1.0)
    log.emit("TIME_STEP")
    u = 2
    for _ in range(steps):
        u += 1
        log.emit("NODE_ADDITION", u)
        s, t = edges[rng.randrange(len(edges))]
        edges.append((s, u))
        edges.append((t, u))
        log.emit("EDGE_ADDITION", u, s, 1.0)
        log.emit("EDGE_ADDITION", u, t, 1.0)
        log.emit("TIME_STEP")
    return log.df(spark)


def dynamic_barabasi_albert_events(
    spark: SparkSession, k: int, steps: int, seed: int = 42
) -> DataFrame:
    """DynamicBarabasiAlbertGenerator.cpp:21-85: k-node seed path, then per
    step a new node with k distinct degree-proportional targets (sampling
    with rejection until k distinct, like the reference's set loop)."""
    if k < 1:
        raise ValueError("k must be at least 1")
    rng = random.Random(seed)
    log = _EventLog()
    deg: dict[int, int] = {}

    def add_edge(a: int, b: int) -> None:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        log.emit("EDGE_ADDITION", a, b, 1.0)

    for i in range(k):
        log.emit("NODE_ADDITION", i)
        deg.setdefault(i, 0)
        if i > 0:
            add_edge(i, i - 1)
    log.emit("TIME_STEP")
    u = k - 1
    for _ in range(steps):
        u += 1
        log.emit("NODE_ADDITION", u)
        deg[u] = 0
        targets: set[int] = set()
        nodes = sorted(n for n in deg if n != u)
        deg_sum = sum(deg[n] for n in nodes)
        while len(targets) < min(k, len(nodes)):
            if deg_sum == 0:
                # all-isolated fallback: uniform (the seed path guarantees
                # this never happens after step 0, but k=1 starts here)
                targets.add(rng.choice(nodes))
                continue
            # exact degree-proportional draw: r uniform in [0, deg_sum),
            # strict < per node — inclusive bounds would give the first
            # node weight deg+1 and make degree-0 nodes selectable
            r = rng.randrange(deg_sum)
            for v in nodes:
                if r < deg[v]:
                    targets.add(v)
                    break
                r -= deg[v]
        for v in sorted(targets):
            add_edge(u, v)
        log.emit("TIME_STEP")
    return log.df(spark)


def dynamic_forest_fire_events(
    spark: SparkSession,
    steps: int,
    p: float = 0.4,
    directed: bool = False,
    r: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """DynamicForestFireGenerator.cpp:23-138 (Leskovec et al. forest fire):
    per step a new node picks a uniform ambassador, burns outward BFS-style —
    at each active node a geometric number of unvisited neighbors catch fire
    (burn until the first uniform draw exceeds ``p``; for directed graphs
    in-neighbors additionally burn at rate ``p*r``) — and the new node links
    to EVERY burned node. Step 0 emits the single seed node, as the
    reference's firstCall branch does."""
    rng = random.Random(seed)
    log = _EventLog()
    fwd: dict[int, set] = {}
    bwd: dict[int, set] = {}

    def add_edge(a: int, b: int) -> None:
        fwd.setdefault(a, set()).add(b)
        bwd.setdefault(b, set()).add(a)
        if not directed:
            fwd.setdefault(b, set()).add(a)
            bwd.setdefault(a, set()).add(b)

    def select_edges(u: int, prob: float, nbrs: dict, visited: set) -> list:
        valid = sorted(x for x in nbrs.get(u, ()) if x not in visited)
        chosen = []
        while valid and rng.random() <= prob:
            i = rng.randrange(len(valid))
            chosen.append(valid[i])
            valid[i] = valid[-1]
            valid.pop()
        return chosen

    n = 0
    if steps > 0:
        log.emit("NODE_ADDITION", 0)
        log.emit("TIME_STEP")
        n = 1
        steps -= 1
    for _ in range(steps):
        a = rng.randrange(n)
        v = n
        n += 1
        log.emit("NODE_ADDITION", v)
        visited = {a}
        active = [a]
        burned = [a]
        while active:
            w = active.pop(0)
            edges = select_edges(w, p, fwd, visited)
            if directed:
                edges += [
                    x for x in select_edges(w, p * r, bwd, visited) if x not in edges
                ]
            for x in edges:
                visited.add(x)
                active.append(x)
                burned.append(x)
        for w in burned:
            add_edge(v, w)
            log.emit("EDGE_ADDITION", v, w, 1.0)
        log.emit("TIME_STEP")
    return log.df(spark)


def dynamic_hyperbolic_events(
    spark: SparkSession,
    n: int,
    steps: int,
    avg_degree: float = 6.0,
    gamma: float = 3.0,
    move_each_step: float = 0.3,
    move_distance: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """DynamicHyperbolicGenerator.cpp:27-60,169-214,280-310 analog (threshold
    model, T=0): n nodes get hyperbolic-disk coordinates (θ uniform, r from
    the quasi-uniform cosh CDF with α=(γ−1)/2, disk radius R as in the static
    generator); each step a seeded ``move_each_step`` fraction of nodes
    drifts — radial movement applied in cosh-CDF space with boundary bounce
    and center crossing (moveNode's newcosh reflection, π angle flip),
    angular movement scaled by 1/r — and the edge set (hyperbolic distance
    ≤ R) is re-derived; the emitted stream is the EDGE_REMOVAL/EDGE_ADDITION
    diff per step. Driver-sequential event producer like the others here;
    the distributed threshold graph at scale is generators.hyperbolic."""
    import math

    rng = random.Random(seed)
    alpha = (gamma - 1.0) / 2.0
    R = 2.0 * math.log(8.0 * n / (math.pi * avg_degree))
    maxcdf, mincdf = math.cosh(alpha * R), 1.0
    angles = [rng.uniform(0.0, 2.0 * math.pi) for _ in range(n)]
    radii = [
        math.acosh(1.0 + (maxcdf - 1.0) * rng.random()) / alpha for _ in range(n)
    ]
    rad_mv = [rng.uniform(-move_distance, move_distance) for _ in range(n)]
    ang_mv = [rng.uniform(-move_distance, move_distance) for _ in range(n)]
    coshR = math.cosh(R)

    def linked(i: int, j: int) -> bool:
        d = math.cosh(radii[i]) * math.cosh(radii[j]) - math.sinh(
            radii[i]
        ) * math.sinh(radii[j]) * math.cos(angles[i] - angles[j])
        return d <= coshR + 1e-12

    def edge_set() -> set:
        return {
            (i, j) for i in range(n) for j in range(i + 1, n) if linked(i, j)
        }

    def move(i: int) -> None:
        newcosh = math.cosh(alpha * radii[i]) + alpha * rad_mv[i]
        newphi = angles[i]
        if newcosh > maxcdf:
            newcosh -= 2.0 * (newcosh - maxcdf)
            rad_mv[i] *= -1.0
        if newcosh < mincdf:
            newcosh += 2.0 * (mincdf - newcosh)
            rad_mv[i] *= -1.0
            newphi += math.pi if newphi <= math.pi else -math.pi
        newr = min(math.acosh(max(newcosh, 1.0)) / alpha, R * (1.0 - 1e-12))
        newphi = (newphi + ang_mv[i] / max(newr, 1e-9)) % (2.0 * math.pi)
        angles[i], radii[i] = newphi, newr

    log = _EventLog()
    for i in range(n):
        log.emit("NODE_ADDITION", i)
    cur = edge_set()
    for a, b in sorted(cur):
        log.emit("EDGE_ADDITION", a, b, 1.0)
    log.emit("TIME_STEP")
    for _ in range(steps):
        movers = [i for i in range(n) if rng.random() < move_each_step]
        for i in movers:
            move(i)
        new = edge_set()
        for a, b in sorted(cur - new):
            log.emit("EDGE_REMOVAL", a, b)
        for a, b in sorted(new - cur):
            log.emit("EDGE_ADDITION", a, b, 1.0)
        cur = new
        log.emit("TIME_STEP")
    return log.df(spark)


def dynamic_path_events(spark: SparkSession, steps: int) -> DataFrame:
    """DynamicPathGenerator analog: a path growing one node per step."""
    log = _EventLog()
    log.emit("NODE_ADDITION", 0)
    log.emit("TIME_STEP")
    for u in range(1, steps + 1):
        log.emit("NODE_ADDITION", u)
        log.emit("EDGE_ADDITION", u - 1, u, 1.0)
        log.emit("TIME_STEP")
    return log.df(spark)


def dynamic_pubweb_events(
    spark: SparkSession,
    n: int,
    steps: int,
    neighborhood_radius: float = 0.25,
    move_distance: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """DynamicPubWebGenerator analog: ``n`` nodes at seeded positions on the
    unit TORUS; every step each node drifts by up to ``move_distance`` and
    the edge set is re-derived as all pairs within ``neighborhood_radius``
    (torus metric); the emitted events are the EDGE_ADDITION/EDGE_REMOVAL
    diff plus EDGE_WEIGHT_UPDATEs left out (reference weights by distance —
    here weight = 1, noted deviation; the dynamics layer under test is
    topology-driven)."""
    rng = random.Random(seed)
    log = _EventLog()
    pos = [(rng.random(), rng.random()) for _ in range(n)]

    def torus_d2(a, b) -> float:
        dx = abs(a[0] - b[0])
        dy = abs(a[1] - b[1])
        dx = min(dx, 1.0 - dx)
        dy = min(dy, 1.0 - dy)
        return dx * dx + dy * dy

    def edge_set() -> set:
        r2 = neighborhood_radius * neighborhood_radius
        return {
            (i, j)
            for i in range(n)
            for j in range(i + 1, n)
            if torus_d2(pos[i], pos[j]) <= r2
        }

    for i in range(n):
        log.emit("NODE_ADDITION", i)
    cur = edge_set()
    for a, b in sorted(cur):
        log.emit("EDGE_ADDITION", a, b, 1.0)
    log.emit("TIME_STEP")
    for _ in range(steps):
        for i in range(n):
            x, y = pos[i]
            x = (x + rng.uniform(-move_distance, move_distance)) % 1.0
            y = (y + rng.uniform(-move_distance, move_distance)) % 1.0
            pos[i] = (x, y)
        new = edge_set()
        for a, b in sorted(cur - new):
            log.emit("EDGE_REMOVAL", a, b)
        for a, b in sorted(new - cur):
            log.emit("EDGE_ADDITION", a, b, 1.0)
        cur = new
        log.emit("TIME_STEP")
    return log.df(spark)
