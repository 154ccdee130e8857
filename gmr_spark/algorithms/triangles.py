"""Triangle counting (reference: algorithms.h:117-195).

The reference runs 2 accumulate-mode supersteps shipping each vertex's whole
adjacency list along every edge and intersecting lists in reduce — O(Σ deg²)
network traffic (algorithms.h:132-170). SURVEY §4 flags this as the one
reference design to *not* port; the scalable Spark formulation is the
canonical-edge 3-way self-join, where Catalyst picks the join strategy and
AQE handles skew:

    und(a,b):  a < b, distinct           (canonical undirected edges)
    triangles = und e1 ⋈ e2 on (e1.b = e2.a) ⋈ e3 on (e3.a = e1.a, e3.b = e2.b)

Each (a<b<c) triangle is counted exactly once. Global count matches the
reference's final ``Σ vertex values`` answer (algorithms.h:189-194).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gmr_spark.graph import PropertyGraph


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """(a BIGINT, b BIGINT) with a < b, exact-duplicate-free."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )


def triangle_count(graph: PropertyGraph) -> DataFrame:
    """-> single row (tri_cnt BIGINT): number of distinct triangles a<b<c."""
    und = canonical_undirected(graph.edges)
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
    )
    return tri.agg(F.count(F.lit(1)).alias("tri_cnt"))


def triangle_count_per_vertex(graph: PropertyGraph) -> DataFrame:
    """-> (id BIGINT, tri_cnt BIGINT): triangles incident to each vertex
    (each triangle counted once per member vertex). Vertices in no triangle
    are omitted (join semantics) — callers left-join against vertices if a
    dense output is needed."""
    und = canonical_undirected(graph.edges)
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(F.col("e1.a").alias("va"), F.col("e1.b").alias("vb"), F.col("e2.b").alias("vc"))
    )
    members = (
        tri.select(F.col("va").alias("id"))
        .unionAll(tri.select(F.col("vb").alias("id")))
        .unionAll(tri.select(F.col("vc").alias("id")))
    )
    return members.groupBy("id").agg(F.count(F.lit(1)).alias("tri_cnt"))
