from .pagerank import pagerank, katz_centrality, eigenvector_centrality
from .components import connected_components, num_components, component_sizes
from .community import plp, modularity, coverage, edge_cut, conductance, coarsen
from .triangles import (
    triangle_count,
    node_triangle_counts,
    local_clustering_coefficient,
    global_clustering_coefficient,
    triangle_edge_score,
)

__all__ = [
    "pagerank",
    "katz_centrality",
    "eigenvector_centrality",
    "connected_components",
    "num_components",
    "component_sizes",
    "plp",
    "modularity",
    "coverage",
    "edge_cut",
    "conductance",
    "coarsen",
    "triangle_count",
    "node_triangle_counts",
    "local_clustering_coefficient",
    "global_clustering_coefficient",
    "triangle_edge_score",
]
