"""EPS graph drawing sink — reference cpp/viz/PostscriptWriter.{h,cpp}
(~198 LoC): writes a graph with 2D coordinates to Encapsulated PostScript,
edges as lines and nodes as filled circles colored by an optional
clustering, with torus wrap-around support.

Spark shape: a drawing is inherently a driver-side artifact (the reference
writes from in-memory coordinates), so the layout/edge DataFrames are
collected — the plot is only sensible for graphs small enough to look at;
coordinate COMPUTATION (operators/graphlayout.py) stays distributed. A
``max_nodes`` guard refuses to collect more.

The emitted PostScript is this module's own minimal dialect (one ``e``
line-draw and one ``n`` circle-fill macro), not the reference's template;
parity is semantic (same drawable information), asserted by parsing the
output back in tests.
"""

from __future__ import annotations

import colorsys
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph

_SIZE = 1000.0
_BORDER = 10.0


def _palette(k: int) -> list[tuple[float, float, float]]:
    """k visually-spread RGB colors (golden-angle hue walk)."""
    cols = []
    for i in range(max(1, k)):
        h = (i * 0.618033988749895) % 1.0
        cols.append(colorsys.hsv_to_rgb(h, 0.8, 0.9))
    return cols


def write_eps(
    graph: Graph,
    coords: DataFrame,
    path: str,
    clustering: Optional[DataFrame] = None,
    torus: bool = False,
    max_nodes: int = 100_000,
) -> None:
    """Draw ``graph`` at ``coords`` (node, x, y — any scale; rescaled to the
    canvas like PostscriptWriter's ps_min/ps_max mapping) into ``path``.
    ``clustering`` (node, label) colors nodes per cluster; ``torus`` skips
    edges that wrap more than half the canvas (the reference's wrapAround
    handling draws them toward the nearer image)."""
    n = graph.num_nodes()
    if n > max_nodes:
        raise ValueError(
            f"write_eps: {n} nodes > max_nodes={max_nodes}; drawings are "
            "driver-side — layout a coarsened/sampled graph instead"
        )
    pts = {
        int(r["node"]): (float(r["x"]), float(r["y"]))
        for r in coords.select("node", "x", "y").collect()
    }
    if not pts:
        raise ValueError("write_eps: empty coordinate table")
    xs = [p[0] for p in pts.values()]
    ys = [p[1] for p in pts.values()]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    sx = (_SIZE - 2 * _BORDER) / ((x1 - x0) or 1.0)
    sy = (_SIZE - 2 * _BORDER) / ((y1 - y0) or 1.0)

    def cv(p):
        return (
            _BORDER + (p[0] - x0) * sx,
            _BORDER + (p[1] - y0) * sy,
        )

    labels = {}
    if clustering is not None:
        labels = {
            int(r["node"]): int(r["label"])
            for r in clustering.select("node", "label").collect()
        }
    uniq = sorted(set(labels.values()))
    pal = _palette(len(uniq))
    color_of = {lab: pal[i % len(pal)] for i, lab in enumerate(uniq)}

    edges = graph.edges.select("src", "dst").collect()
    lines = [
        "%!PS-Adobe-3.0 EPSF-3.0",
        f"%%BoundingBox: 0 0 {int(_SIZE)} {int(_SIZE)}",
        "%%EndComments",
        "/e {moveto lineto stroke} def",
        "/n {2 0 360 arc fill} def",
        "0.5 setlinewidth",
        "0.7 0.7 0.7 setrgbcolor",
    ]
    half = _SIZE / 2.0
    for r in edges:
        u, v = int(r["src"]), int(r["dst"])
        if u not in pts or v not in pts:
            continue
        ax, ay = cv(pts[u])
        bx, by = cv(pts[v])
        if torus and (abs(ax - bx) > half or abs(ay - by) > half):
            continue  # wrapped edge: skip the long image
        lines.append(f"{ax:.2f} {ay:.2f} {bx:.2f} {by:.2f} e")
    for node in sorted(pts):
        r, g, b = color_of.get(labels.get(node), (0.1, 0.1, 0.8))
        px, py = cv(pts[node])
        lines.append(f"{r:.3f} {g:.3f} {b:.3f} setrgbcolor")
        lines.append(f"{px:.2f} {py:.2f} n")
    lines.append("showpage")
    lines.append("%%EOF")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def draw(
    graph: Graph,
    path: str,
    clustering: Optional[DataFrame] = None,
    layout: str = "multilevel",
    seed: int = 42,
) -> None:
    """One-call convenience mirroring PostscriptWriter.write(G, path):
    computes a layout (``multilevel`` | ``fr`` | ``pivot_mds``) and writes
    the EPS."""
    from ..operators.graphlayout import (
        fruchterman_reingold,
        multilevel_layout,
        pivot_mds,
    )

    if layout == "multilevel":
        coords = multilevel_layout(graph, seed=seed)
    elif layout == "fr":
        coords = fruchterman_reingold(graph, seed=seed)
    elif layout == "pivot_mds":
        coords = pivot_mds(graph, seed=seed).select(
            "node", F.col("x0").alias("x"), F.col("x1").alias("y")
        )
    else:
        raise ValueError(f"unknown layout {layout!r}")
    write_eps(graph, coords, path, clustering=clustering)
