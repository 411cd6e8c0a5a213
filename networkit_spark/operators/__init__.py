from .pagerank import pagerank, katz_centrality, eigenvector_centrality
from .components import connected_components, num_components, component_sizes
from .community import plp, modularity, coverage, edge_cut, conductance, coarsen
from .triangles import (
    triangle_count,
    node_triangle_counts,
    local_clustering_coefficient,
    global_clustering_coefficient,
    approx_avg_local_clustering,
    approx_global_clustering,
    triangle_edge_score,
    k_truss,
)
from .kcore import k_core, coreness
from .distance import (
    bfs_distances,
    sssp_distances,
    eccentricity,
    neighborhood_function_anf,
    neighborhood_function_heuristic,
    effective_diameter_approx,
)
from .misc import union_maximum_spanning_forest
from .centrality import (
    degree_centrality,
    sfigality,
    closeness_sampled,
    betweenness_sampled,
    approx_betweenness,
    approx_closeness,
    ranking,
    centralization,
    degree_assortativity,
)
from .linkprediction import (
    link_prediction_scores,
    missing_links,
    same_community_index,
    link_thresholder,
    top_predictions,
)
from .scd import gce_expand
from .spectral import laplacian_eigenvectors, spectral_partition
from .cliques import maximal_cliques, clique_number, max_clique
from .flow import (
    edmonds_karp,
    max_flow_value,
    min_st_cut,
    cut_clustering,
    cut_clustering_hierarchy,
)
from .simulation import seir_simulation
from .graphlayout import pivot_mds
from .algebraic import (
    laplacian_smooth,
    conjugate_gradient,
    effective_resistance,
    commute_time_distance,
    spanning_edge_centrality,
)
from .sparsification import (
    jaccard_similarity_score,
    local_degree_score,
    random_edge_score,
    simmelian_overlap_score,
    normalize_score,
    blend_scores,
    score_as_weight,
    global_threshold_filter,
    sparsify_to_ratio,
    chance_corrected_triangle_score,
    multiscale_score,
    forest_fire_score,
    random_node_edge_score,
    modularity_edge_score,
    linearize_score,
)
from .community import hashing_overlapper
from .coloring import jones_plassmann_coloring

__all__ = [n for n in dir() if not n.startswith("_")]

from .flow import push_relabel, push_relabel_batched
from .matching import local_max_matching, path_growing_matching, matching_coarsening
from .semirings import (
    SEMIRINGS,
    mxv,
    mxm,
    ewise,
    adjacency_matrix,
    bfs_algebraic,
    sssp_algebraic,
    reachability,
)
from .graphlayout import fruchterman_reingold, multilevel_layout
from .webstructure import (
    hits,
    reciprocity,
    bowtie_decomposition,
    bowtie_profile,
    powerlaw_alpha,
    rich_club,
    salsa,
    avg_neighbor_degree,
    knn_degree_correlation,
)

__all__ = [n for n in dir() if not n.startswith("_")]
