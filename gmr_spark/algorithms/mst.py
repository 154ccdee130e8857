"""Minimum spanning forest — Borůvka over DataFrames.

The reference declares a ``Prime`` (Prim/MST) algorithm but ships an empty
stub (algorithms.h:215); its roadmap cites GraphX's operator list
(algorithms.h:217-222). This implements the standard distributed choice,
Borůvka: every phase each component picks its minimum incident cross-edge,
the picked edges join the forest, and touching components merge — O(log V)
phases, each a join + aggregation, which is exactly the shape Spark executes
well (no per-vertex sequential scan like Prim, no global sorted edge stream
like Kruskal).

Determinism: edges are canonicalized to (a < b, min parallel weight) and
ordered by the strict total order (weight, a, b) — under a strict total edge
order the MST is *unique*, so Borůvka here equals Kruskal with the same
tie-break (tests/test_properties.py checks that).

Scale notes (100 TB): the per-phase work is one edges⋈labels join (edges
hash-partitioned by endpoint), one min-by-component aggregation (partial
map-side combine — the struct min is algebraic), and a component-graph label
propagation whose input shrinks geometrically (≤ |components| rows, halving
per phase). Label propagation folds in a pointer-jump (label := label of
label) so long hook-chains collapse in O(log chain) rounds instead of
O(chain). State is localCheckpoint-ed per step per the repo's iterative-loop
rules (plans/pregel.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gmr_spark.graph import PropertyGraph
from gmr_spark.plans.pregel import small_loop_conf


def _min_label_fixpoint(nodes: DataFrame, und_edges: DataFrame,
                        max_iter: int = 64) -> DataFrame:
    """Exact min-id labels per connected component of a (small) graph.

    nodes: (u BIGINT); und_edges: (u, v) symmetric. Returns (u, lbl).
    Monotone min-propagation with a pointer-jump accelerator; stops at the
    propagation fixpoint, where labels are provably constant per component
    and equal to the component's minimum id.
    """
    lbl = nodes.select("u", F.col("u").alias("lbl")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nb = (
            und_edges.join(lbl.withColumnRenamed("u", "v"), "v")
            .groupBy("u").agg(F.min("lbl").alias("ml"))
        )
        prop = (
            lbl.join(nb, "u", "left")
            .select("u", F.least("lbl", F.coalesce("ml", "lbl")).alias("lbl"))
        )
        # pointer jump: labels are node ids, so re-resolve through the table
        jump = (
            prop.join(
                prop.select(F.col("u").alias("lbl"), F.col("lbl").alias("lbl2")),
                "lbl",
            ).select("u", F.col("lbl2").alias("lbl"))
        ).localCheckpoint(eager=True)
        changed = (
            jump.join(lbl.withColumnRenamed("lbl", "old"), "u")
            .filter(F.col("lbl") < F.col("old"))
        )
        improved = not changed.isEmpty()
        lbl = jump
        if not improved:
            break
    return lbl


def minimum_spanning_forest(graph: PropertyGraph, *,
                            max_phases: int = 32) -> DataFrame:
    """-> (src BIGINT, dst BIGINT, weight DOUBLE), src < dst: the unique
    minimum spanning forest under the strict edge order (weight, src, dst).

    Direction is ignored (MST is an undirected notion); parallel edges keep
    their minimum weight.
    """
    spark = graph.edges.sparkSession
    canon = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight").alias("w"),
        )
        .groupBy("a", "b").agg(F.min("w").alias("w"))
    ).localCheckpoint(eager=True)
    comp = graph.vertices.select(
        "id", F.col("id").alias("comp")
    ).localCheckpoint(eager=True)
    mst = spark.createDataFrame([], "a bigint, b bigint, w double")

    # |E|-scoped physical conf for the phase loop (the count reads the
    # just-materialized checkpoint blocks — metadata-cheap); no-op on graphs
    # past the big-graph threshold, where AQE earns its keep
    with small_loop_conf(spark, canon.count()):
        mst = _boruvka_phases(canon, comp, mst, max_phases)
    return mst.select(
        F.col("a").alias("src"), F.col("b").alias("dst"),
        F.col("w").alias("weight"),
    )


def _boruvka_phases(canon: DataFrame, comp: DataFrame, mst: DataFrame,
                    max_phases: int) -> DataFrame:
    """The Borůvka phase loop of :func:`minimum_spanning_forest`, split out
    so ``small_loop_conf`` wraps it in one scope. Returns the forest
    (a, b, w)."""
    for _ in range(max_phases):
        lab = (
            canon
            .join(comp.select(F.col("id").alias("a"),
                              F.col("comp").alias("ca")), "a")
            .join(comp.select(F.col("id").alias("b"),
                              F.col("comp").alias("cb")), "b")
            .filter(F.col("ca") != F.col("cb"))
        ).localCheckpoint(eager=True)
        if lab.isEmpty():
            break
        # each component picks its minimum incident cross-edge by (w, a, b)
        incident = lab.select(
            F.col("ca").alias("comp"), "w", "a", "b", "ca", "cb"
        ).unionByName(
            lab.select(F.col("cb").alias("comp"), "w", "a", "b", "ca", "cb")
        )
        sel = (
            incident.groupBy("comp")
            .agg(F.min(F.struct("w", "a", "b", "ca", "cb")).alias("m"))
            .select("m.w", "m.a", "m.b", "m.ca", "m.cb")
            .distinct()
        ).localCheckpoint(eager=True)
        mst = mst.unionByName(sel.select("a", "b", "w")).localCheckpoint(eager=True)
        # merge components: min-label over the picked component-graph edges
        nodes = comp.select(F.col("comp").alias("u")).distinct()
        cg = sel.select(F.col("ca").alias("u"), F.col("cb").alias("v")).unionByName(
            sel.select(F.col("cb").alias("u"), F.col("ca").alias("v"))
        ).distinct()
        lbl = _min_label_fixpoint(nodes, cg)
        comp = (
            comp.join(lbl, comp["comp"] == lbl["u"])
            .select("id", F.col("lbl").alias("comp"))
        ).localCheckpoint(eager=True)

    return mst
