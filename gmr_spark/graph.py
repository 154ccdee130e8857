"""PropertyGraph — the engine's core data abstraction.

Maps the reference's per-process CSR ``graph_t`` (partition.h:20-42) to a pair
of DataFrames:

    vertices(id BIGINT, value DOUBLE, active BOOLEAN)
    edges(src BIGINT, dst BIGINT, weight DOUBLE)

- ``fvwgts`` (the one mutable float per vertex, partition.h:39) -> ``value``
- ``status`` active/inactive flags (partition.h:41)            -> ``active``
- ``fadjwgt`` edge weights (partition.h:40)                    -> ``weight``
- ``adjloc`` owner routing table (partition.h:26)              -> Spark hash
  partitioning; no explicit owner column is needed because the shuffle *is*
  the routing.

Ids are 64-bit from day one (the reference's int32 ids, partition.h:23, cap
out at 2^31 vertices — unacceptable at 100 TB).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class PropertyGraph:
    vertices: DataFrame  # id BIGINT [, value DOUBLE, active BOOLEAN, ...]
    edges: DataFrame     # src BIGINT, dst BIGINT, weight DOUBLE

    @staticmethod
    def from_edges(edges: DataFrame, num_partitions: int | None = None) -> "PropertyGraph":
        """Build a graph from an edge list; vertices = distinct endpoint ids.

        Pre-partitions edges by ``src`` so every superstep's message join
        (edges ⋈ vertices on src) reuses one co-partitioning instead of
        re-shuffling per iteration — the Spark analog of the reference
        precomputing ``adjloc`` once at load (partition.h:276-295).
        """
        edges = edges.select(
            F.col("src").cast("bigint").alias("src"),
            F.col("dst").cast("bigint").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
        if num_partitions:
            edges = edges.repartition(num_partitions, "src")
        vertices = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        return PropertyGraph(vertices=vertices, edges=edges)

    def undirected(self) -> "PropertyGraph":
        """Symmetric closure: add the reverse of every edge.

        Dedups FULL (src, dst, weight) rows — matching the oracle's UNION
        closure. Deduping on (src, dst) alone would keep an arbitrary
        (nondeterministic) weight when parallel edges carry different
        weights."""
        rev = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return PropertyGraph(
            vertices=self.vertices,
            edges=self.edges.unionByName(rev).distinct(),
        )

    def out_degrees(self) -> DataFrame:
        """id, out_degree (vertices with no out-edges get 0)."""
        deg = self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("out_degree")
        )
        return (
            self.vertices.select("id")
            .join(deg, "id", "left")
            .select("id", F.coalesce("out_degree", F.lit(0)).alias("out_degree"))
        )

    def in_degrees(self) -> DataFrame:
        deg = self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").alias("in_degree")
        )
        return (
            self.vertices.select("id")
            .join(deg, "id", "left")
            .select("id", F.coalesce("in_degree", F.lit(0)).alias("in_degree"))
        )
