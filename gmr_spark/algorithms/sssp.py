"""Single-source shortest paths + BFS (reference: algorithms.h:4-68).

Reference semantics: init source=0 else FLT_MAX (algorithms.h:8-21); relax
``min(own, dist_u + w)`` pulled from in-neighbors (algorithms.h:23-38); reduce
= min (algorithms.h:44-56); cover update; Bellman-Ford to fixpoint. The
reference forces all edge weights to 1.0 (algorithms.h:17-18) so its SSSP *is*
BFS; this engine supports both weighted and unit modes.

Divergence from reference (documented, SURVEY §5): unreachable vertices are
NULL (not FLT_MAX), and the premature-convergence bug (igmr.cpp:147-149,
converged-at-FLT_MAX counting) is fixed — we run to a true fixpoint.

Scale: frontier-based Bellman-Ford — each superstep joins only the vertices
improved last round against the (pre-partitioned, cached) edges; message
aggregation is ``min`` (algebraic → map-side partial agg). This is the
standard Pregel SSSP that runs on billion-edge graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gmr_spark.graph import PropertyGraph
from gmr_spark.plans.pregel import run_pregel


class _SSSPProgram:
    def __init__(self, source: int, weighted: bool):
        self.source = int(source)
        self.weighted = weighted

    def init(self, vertices: DataFrame) -> DataFrame:
        return vertices.select(
            "id",
            F.when(F.col("id") == self.source, F.lit(0.0)).cast("double").alias("value"),
            (F.col("id") == self.source).alias("active"),
        )

    def messages(self, frontier: DataFrame, edges: DataFrame) -> DataFrame:
        w = F.col("weight") if self.weighted else F.lit(1.0)
        f = frontier.select(F.col("id").alias("fid"), F.col("value").alias("fdist"))
        return edges.join(f, F.col("src") == F.col("fid")).select(
            F.col("dst").alias("id"), (F.col("fdist") + w).alias("msg")
        )

    def aggregate(self, msgs: DataFrame) -> DataFrame:
        return msgs.groupBy("id").agg(F.min("msg").alias("agg"))

    def update(self, vertices: DataFrame, agg: DataFrame) -> DataFrame:
        improved = F.col("agg").isNotNull() & (
            F.col("value").isNull() | (F.col("agg") < F.col("value"))
        )
        return vertices.join(agg, "id", "left").select(
            "id",
            F.when(improved, F.col("agg")).otherwise(F.col("value")).alias("value"),
            improved.alias("active"),
        )


def sssp(graph: PropertyGraph, source: int, *, weighted: bool = True,
         max_iter: int = 120) -> DataFrame:
    """-> (id BIGINT, dist DOUBLE); dist NULL = unreachable."""
    result = run_pregel(graph, _SSSPProgram(source, weighted), max_iter=max_iter)
    return result.vertices.select("id", F.col("value").alias("dist"))


def bfs(graph: PropertyGraph, source: int, *, max_iter: int = 120) -> DataFrame:
    """BFS levels = unit-weight SSSP (the reference's actual SSSP,
    algorithms.h:17-18). -> (id, level DOUBLE)."""
    result = run_pregel(graph, _SSSPProgram(source, weighted=False), max_iter=max_iter)
    return result.vertices.select("id", F.col("value").alias("level"))
