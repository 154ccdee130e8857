"""Synchronous label propagation (community detection).

The reference has no LPA, but its Pregel surface (gmr.h:92-123) is exactly
what LPA needs: init label = own id; each superstep every vertex adopts the
most frequent label among in-neighbors, ties broken by the smallest label
(deterministic — plain LPA's random tie-break would be oracle-hostile).
Fixed ``k`` supersteps, no early stop: synchronous LPA can 2-cycle on
bipartite structures, so "no change" is not a safe termination signal and a
fixed horizon keeps the engine and the unrolled oracle in lockstep.

Scale: the mode aggregation is two chained hash aggregations —
groupBy(id, label).count (map-side combinable: a hot vertex's duplicate
incoming labels collapse per task) then groupBy(id).max_by((count, -label))
(fan-in bounded by #distinct labels per vertex). No windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gmr_spark.graph import PropertyGraph
from gmr_spark.plans.pregel import run_pregel


class _LPAProgram:
    """Labels ride the Pregel ``value`` slot as doubles — exact for any
    vertex id below 2^53 (ids here are < 3M)."""

    def init(self, vertices: DataFrame) -> DataFrame:
        return vertices.select(
            "id", F.col("id").cast("double").alias("value"),
            F.lit(True).alias("active"),
        )

    def messages(self, frontier: DataFrame, edges: DataFrame) -> DataFrame:
        f = frontier.select(F.col("id").alias("fid"), F.col("value").alias("lbl"))
        return edges.join(f, F.col("src") == F.col("fid")).select(
            F.col("dst").alias("id"), F.col("lbl").alias("msg")
        )

    def aggregate(self, msgs: DataFrame) -> DataFrame:
        counts = msgs.groupBy("id", "msg").agg(F.count(F.lit(1)).alias("cnt"))
        # mode with deterministic tie-break: max over (count, -label) picks
        # the highest count, then the smallest label
        return counts.groupBy("id").agg(
            F.max_by("msg", F.struct(F.col("cnt"), (-F.col("msg")))).alias("agg")
        )

    def update(self, vertices: DataFrame, agg: DataFrame) -> DataFrame:
        return vertices.join(agg, "id", "left").select(
            "id",
            F.coalesce(F.col("agg"), F.col("value")).alias("value"),
            F.lit(True).alias("active"),
        )


def label_propagation(graph: PropertyGraph, *, k: int = 4) -> DataFrame:
    """-> (id BIGINT, label BIGINT): community label after ``k`` synchronous
    supersteps."""
    result = run_pregel(graph, _LPAProgram(), max_iter=k, early_stop=False)
    return result.vertices.select(
        "id", F.col("value").cast("bigint").alias("label")
    )
