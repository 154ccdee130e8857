"""Connected components — min-id label propagation + pointer jumping.

The reference declares ``connectedComponents`` but ships an empty stub
(algorithms.h:210); the semantics implemented here are the classic
GraphX/Pregel ones its roadmap cites (algorithms.h:217-222): every vertex's
label converges to the minimum vertex id in its (weakly) connected component.

Algorithm (round-3 verdict item 4 — the 100 TB long-chain hardening): each
ROUND alternates
  (1) one min-neighbor propagation step
      ``label' = min(label, min over in-neighbors' labels)``, then
  (2) pointer doubling to fixpoint: ``label = label[label]`` repeated until
      unchanged — each doubling join halves every label-chain's depth, so a
      chain of length L collapses in ceil(log2 L) |V|-row joins.
Plain propagation needs O(diameter) supersteps (a 10k-vertex path = 10k
edge-join rounds); with jumping, rounds = O(log n) — pinned by a property
test on exactly that path graph. MST's label collapse uses the same trick
(mst.py:24-27). Invariants: labels only decrease, ``label[v] ≤ v``, and
every label is the id of a vertex in v's component; the fixpoint where
propagation finds no improvement is exactly "every component shares its
minimum id as label".

Determinism: labels decrease monotonically, so a converged run equals the
K-step bounded propagation for any K ≥ convergence step — the DuckDB oracle
unrolls K steps of ``label = min(own, min(neighbor labels))`` (unchanged by
the jumping rewrite, which only accelerates convergence to the same
fixpoint).

Scale: the propagation join reuses the edges' src partitioning; the jump
join touches only the |V|-row label table; every round localCheckpoints to
cut lineage (same cadence policy as run_pregel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

from gmr_spark.graph import PropertyGraph
from gmr_spark.plans.pregel import (
    _drop_checkpoint_blocks,
    checkpoint_eager,
    run_pregel,
)


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


_JUMP_CAP = 64  # > log2 of any feasible |V|; trips only on a logic bug


def _cc_labels(g: PropertyGraph, max_iter: int) -> tuple[DataFrame, dict]:
    """Alternating propagate + pointer-double loop over (id, label).
    Returns the converged label table and counters for the property test:
    ``rounds`` (propagation steps) and ``jump_joins`` (doubling joins)."""
    edges = g.edges.select("src", "dst")
    labels = checkpoint_eager(g.vertices.select(
        "id", F.col("id").alias("label")
    ))
    # superseded label checkpoints are released as soon as their successor
    # is materialized (round-10: this loop predated the release discipline
    # run_pregel/_backward_members follow — at 100 TB a long run stranded
    # O(rounds + jump_joins) |V|-row block sets on the async
    # ContextCleaner). prev IS the live binding; on failure the helper
    # releases the in-flight checkpoint and the except path the last good
    # one — the returned fixpoint is never released here.
    prev = labels

    stats = {"rounds": 0, "jump_joins": 0, "converged": False}
    try:
        for _ in range(max_iter):
            # (1) one min-neighbor propagation step; `improved` is observed
            # during the checkpoint materialization — ONE job per step
            nbr_min = (
                edges.join(labels.select(F.col("id").alias("src"),
                                         F.col("label").alias("slabel")), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("slabel").alias("nlabel"))
            )
            obs = Observation()
            labels = checkpoint_eager(
                labels.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.least("label", F.coalesce("nlabel", "label")).alias("label"),
                    (F.coalesce("nlabel", "label") < F.col("label")).alias("_imp"),
                )
                .observe(obs, F.sum(F.col("_imp").cast("long")).alias("n_improved"))
                .drop("_imp")
            )
            _drop_checkpoint_blocks(prev)
            prev = labels
            stats["rounds"] += 1
            if (obs.get["n_improved"] or 0) == 0:
                stats["converged"] = True
                break

            # (2) pointer doubling to fixpoint: label = label[label]
            for _ in range(_JUMP_CAP):
                jump_obs = Observation()
                labels = checkpoint_eager(
                    labels.join(
                        labels.select(F.col("id").alias("label"),
                                      F.col("label").alias("_ll")),
                        "label", "left",
                    )
                    .select(
                        "id",
                        F.coalesce("_ll", "label").alias("label"),
                        (F.coalesce("_ll", "label") < F.col("label")).alias("_imp"),
                    )
                    .observe(jump_obs,
                             F.sum(F.col("_imp").cast("long")).alias("n_jumped"))
                    .drop("_imp")
                )
                _drop_checkpoint_blocks(prev)
                prev = labels
                stats["jump_joins"] += 1
                if (jump_obs.get["n_jumped"] or 0) == 0:
                    break
    except BaseException:
        _drop_checkpoint_blocks(prev)
        raise
    return labels, stats


def connected_components(graph: PropertyGraph, *, max_iter: int = 120,
                         undirected: bool = True) -> DataFrame:
    """-> (id BIGINT, component BIGINT). Treats the graph as undirected
    (weak components) unless ``undirected=False`` (caller already symmetric)."""
    g = graph.undirected() if undirected else graph
    labels, _ = _cc_labels(g, max_iter)
    return labels.select("id", F.col("label").alias("component"))
