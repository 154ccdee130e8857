"""Strongly connected components — forward-backward coloring.

The reference declares ``stronglyConnectedComponents`` as an empty stub whose
comment cites GraphX's operator list (algorithms.h:217-222); this is the
distributed coloring algorithm (Orzan; also GraphX's strategy) expressed in
DataFrames:

repeat until every vertex is assigned:
  1. *color* phase — propagate ``min id that reaches v`` forward along edges
     over the unassigned subgraph (min-label Pregel loop);
  2. vertices with ``color == id`` are SCC roots;
  3. *membership* phase — from each root, propagate backward along reversed
     edges, but only across vertices of the same color; every vertex reached
     is in the root's SCC (mutual reachability: forward via the color,
     backward via the walk);
  4. assign those vertices ``scc = color``, remove them, repeat.

Output label = min vertex id of the SCC (deterministic).

Scale: each phase is two frontier Pregel loops; worst case (one long path)
degenerates, but on real graphs a few phases peel everything. Per-phase
localCheckpoint bounds lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

from gmr_spark.graph import PropertyGraph
from gmr_spark.plans.pregel import _drop_checkpoint_blocks


def _min_forward_colors(vertices: DataFrame, edges: DataFrame, max_iter: int) -> DataFrame:
    """(id, color): min id that reaches id along ``edges`` (incl. itself).

    This is exactly directed min-label propagation, so it reuses the CC
    Pregel program under the shared driver (one place owns lineage /
    convergence mechanics)."""
    from gmr_spark.algorithms.cc import _CCProgram
    from gmr_spark.plans.pregel import run_pregel

    result = run_pregel(
        PropertyGraph(vertices=vertices.select("id"), edges=edges),
        _CCProgram(), max_iter=max_iter,
    )
    return result.vertices.select("id", F.col("value").alias("color"))


def _backward_members(colors: DataFrame, edges: DataFrame, max_iter: int) -> DataFrame:
    """(id, color) of vertices that reach their color's root backward through
    same-colored vertices — i.e. the members of each root's SCC.

    ONE job per superstep: the convergence census rides the eager
    localCheckpoint's materializing job as an ``Observation`` metric (same
    pattern as ``run_pregel``) instead of a second ``limit(1).count()``
    action — halves driver round-trips in the peel loop."""
    state = colors.select(
        "id", "color", (F.col("color") == F.col("id")).alias("member"),
        (F.col("color") == F.col("id")).alias("active"),
    ).localCheckpoint(eager=True)
    prev_state = state
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    for _ in range(max_iter):
        frontier = state.filter("active").select(
            F.col("id").alias("fid"), F.col("color").alias("fcolor")
        )
        msgs = rev.join(frontier, F.col("src") == F.col("fid")).select(
            F.col("dst").alias("id"), F.col("fcolor").alias("msg")
        )
        agg = msgs.groupBy("id").agg(F.collect_set("msg").alias("msg_colors"))
        newly = (
            ~F.col("member")
            & F.col("msg_colors").isNotNull()
            & F.array_contains(F.coalesce(F.col("msg_colors"), F.array()), F.col("color"))
        )
        obs = Observation()
        state = (
            state.join(agg, "id", "left")
            .select(
                "id", "color",
                (F.col("member") | newly).alias("member"),
                newly.alias("active"),
            )
            .observe(obs, F.sum(F.col("active").cast("long")).alias("n_active"))
            .localCheckpoint(eager=True)
        )
        _drop_checkpoint_blocks(prev_state)
        prev_state = state
        if (obs.get["n_active"] or 0) == 0:
            break
    return state.filter("member").select("id", "color")


def strongly_connected_components(graph: PropertyGraph, *, max_iter: int = 120,
                                  max_phases: int = 50) -> DataFrame:
    """-> (id BIGINT, scc BIGINT) with scc = min vertex id in the SCC.

    Raises RuntimeError if vertices remain unassigned after ``max_phases``
    (each phase peels ≥1 SCC, so this only triggers on adversarial long
    chains of singleton SCCs — raise the cap rather than return a silently
    partial labeling).
    """
    remaining_v = graph.vertices.select("id").localCheckpoint(eager=True)
    remaining_e = graph.edges.select("src", "dst").localCheckpoint(eager=True)
    empty = remaining_v.sparkSession.createDataFrame([], "id bigint, scc bigint")
    assigned_parts: list[DataFrame] = [empty]

    done = False
    for _ in range(max_phases):
        if remaining_v.limit(1).count() == 0:
            done = True
            break
        colors = _min_forward_colors(remaining_v, remaining_e, max_iter)
        members = _backward_members(colors, remaining_e, max_iter)
        assigned_parts.append(
            members.select("id", F.col("color").alias("scc")).localCheckpoint(eager=True)
        )
        member_ids = members.select("id")
        remaining_v = remaining_v.join(member_ids, "id", "left_anti").localCheckpoint(eager=True)
        remaining_e = (
            remaining_e.join(member_ids.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(member_ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    if not done and remaining_v.limit(1).count() > 0:
        raise RuntimeError(
            f"SCC did not assign every vertex within max_phases={max_phases}; "
            "raise max_phases for graphs with very long singleton-SCC chains"
        )

    out = assigned_parts[0]
    for part in assigned_parts[1:]:
        out = out.unionByName(part)
    return out
