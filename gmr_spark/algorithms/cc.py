"""Connected components — min-id label propagation.

The reference declares ``connectedComponents`` but ships an empty stub
(algorithms.h:210); the semantics implemented here are the classic
GraphX/Pregel ones its roadmap cites (algorithms.h:217-222): every vertex's
label converges to the minimum vertex id in its (weakly) connected component.

Determinism: labels decrease monotonically, so a converged run equals the
K-step bounded propagation for any K ≥ convergence step — the DuckDB oracle
unrolls K steps of ``label = min(own, min(neighbor labels))``.

Scale: frontier-based — only vertices whose label improved broadcast next
superstep; on real graphs the frontier collapses after a few supersteps
(large-star/small-star would be the next optimization for 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gmr_spark.graph import PropertyGraph
from gmr_spark.plans.pregel import run_pregel


class _CCProgram:
    def init(self, vertices: DataFrame) -> DataFrame:
        return vertices.select(
            "id", F.col("id").alias("value"), F.lit(True).alias("active")
        )

    def messages(self, frontier: DataFrame, edges: DataFrame) -> DataFrame:
        f = frontier.select(F.col("id").alias("fid"), F.col("value").alias("flabel"))
        return edges.join(f, F.col("src") == F.col("fid")).select(
            F.col("dst").alias("id"), F.col("flabel").alias("msg")
        )

    def aggregate(self, msgs: DataFrame) -> DataFrame:
        return msgs.groupBy("id").agg(F.min("msg").alias("agg"))

    def update(self, vertices: DataFrame, agg: DataFrame) -> DataFrame:
        improved = F.col("agg").isNotNull() & (F.col("agg") < F.col("value"))
        return vertices.join(agg, "id", "left").select(
            "id",
            F.when(improved, F.col("agg")).otherwise(F.col("value")).alias("value"),
            improved.alias("active"),
        )


def connected_components(graph: PropertyGraph, *, max_iter: int = 120,
                         undirected: bool = True) -> DataFrame:
    """-> (id BIGINT, component BIGINT). Treats the graph as undirected
    (weak components) unless ``undirected=False`` (caller already symmetric)."""
    g = graph.undirected() if undirected else graph
    result = run_pregel(g, _CCProgram(), max_iter=max_iter)
    return result.vertices.select("id", F.col("value").alias("component"))
