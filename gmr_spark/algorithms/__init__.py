from gmr_spark.algorithms.sssp import sssp, bfs, shortest_paths
from gmr_spark.algorithms.pagerank import pagerank, personalized_pagerank
from gmr_spark.algorithms.cc import connected_components
from gmr_spark.algorithms.triangles import k_truss, local_clustering, triangle_count
from gmr_spark.algorithms.kcore import k_core
from gmr_spark.algorithms.scc import strongly_connected_components
from gmr_spark.algorithms.matmul import matmul_coo
from gmr_spark.algorithms.mst import minimum_spanning_forest
from gmr_spark.algorithms.lpa import label_propagation

__all__ = [
    "label_propagation",
    "sssp",
    "bfs",
    "shortest_paths",
    "pagerank",
    "personalized_pagerank",
    "connected_components",
    "triangle_count",
    "local_clustering",
    "k_core",
    "k_truss",
    "strongly_connected_components",
    "matmul_coo",
    "minimum_spanning_forest",
]
