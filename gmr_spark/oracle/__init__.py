from gmr_spark.oracle.sql import (
    bfs_sql,
    cc_sql,
    collect_neighbors_sql,
    degrees_sql,
    lpa_sql,
    matmul_sql,
    mst_sql,
    pagerank_sql,
    scc_sql,
    sssp_sql,
    triangle_sql,
    weighted_indegree_sql,
)

__all__ = [
    "bfs_sql",
    "cc_sql",
    "collect_neighbors_sql",
    "degrees_sql",
    "lpa_sql",
    "matmul_sql",
    "mst_sql",
    "pagerank_sql",
    "scc_sql",
    "sssp_sql",
    "triangle_sql",
    "weighted_indegree_sql",
]
