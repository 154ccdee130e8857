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


def undirected_degrees(und: DataFrame) -> DataFrame:
    """(id BIGINT, degree BIGINT) over a canonical edge set (a < b) — the
    shared degree derivation for local_clustering / graph statistics /
    assortativity (one shape, one place to fix; isolated vertices are
    absent by construction, callers left-join vertices if dense output is
    needed)."""
    return (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )


def triangle_count(graph: PropertyGraph) -> DataFrame:
    """-> single row (tri_cnt BIGINT): number of distinct triangles a<b<c.

    Both self-joins carry an explicit ``shuffle_hash`` hint on the edge-set
    side: the canonical edge set sits behind distinct-over-checkpoint plans
    whose size statistics Catalyst cannot see, and at G2 scale (110M
    canonical edges ≈ 10.6 GiB) the resulting broadcast mis-plan aborts the
    job outright — the identical estimate trap run_pregel pins against
    (plans/pregel.py:166-183; hit live on the first G2 TC run, round 4).
    Shuffle-hash is also the shape you want: no sort of the multi-billion-row
    wedge stream (SMJ would), and the build side is |E|/num_partitions per
    task."""
    und = canonical_undirected(graph.edges)
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2.hint("shuffle_hash"), F.col("e1.b") == F.col("e2.a"))
        .join(e3.hint("shuffle_hash"),
              (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
    )
    return tri.agg(F.count(F.lit(1)).alias("tri_cnt"))


def triangle_count_reference_semantics(graph: PropertyGraph) -> DataFrame:
    """The reference's own TriangleCount formulation (algorithms.h:117-195),
    re-expressed declaratively — kept as the semantics witness for the
    join-based operator above and as the demo of the reference's composite-
    key + list-valued KV surface (``KV{key, skey, value, svalue}``,
    gmr.h:37-44):

    - superstep-1 map: every vertex v sends, for each neighbor u, the key
      ``(min(v,u), max(v,u))`` carrying v's whole adjacency list
      (algorithms.h:132-147) → here: adjacency = ``collect_set`` (the
      svalue), key = canonical edge (the key/skey pair);
    - reduce on groups with exactly 2 entries — i.e. the edge exists in both
      directions (algorithms.h:156) — counts common neighbors c with
      c > max(a,b) (algorithms.h:158-166) → here: ``array_intersect`` +
      ``filter`` + ``size``;
    - final answer = Σ over groups (the reference accumulates onto vertex a
      then sums all vertex values, algorithms.h:189-194).

    SURVEY §4 flags the O(Σ deg²) adjacency shipping as the one reference
    design not to scale; this stays the test-oracle twin while
    ``triangle_count`` is the production path.
    """
    adj = graph.edges.filter(F.col("src") != F.col("dst")).groupBy(
        F.col("src").alias("v")
    ).agg(F.collect_set("dst").alias("nbrs"))
    e = graph.edges.filter(F.col("src") != F.col("dst")).select(
        "src", "dst",
        F.least("src", "dst").alias("key"),
        F.greatest("src", "dst").alias("skey"),
    )
    msgs = e.join(adj, e.src == adj.v).select("key", "skey", "src", "nbrs")
    groups = msgs.groupBy("key", "skey").agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.collect_list("nbrs").alias("svalue"),
    )
    per_edge = groups.filter(F.col("n_entries") == 2).select(
        "key", "skey",
        F.size(
            F.filter(
                F.array_intersect(F.col("svalue")[0], F.col("svalue")[1]),
                lambda c: c > F.col("skey"),
            )
        ).alias("tri"),
    )
    return per_edge.agg(F.sum("tri").cast("long").alias("tri_cnt"))


def local_clustering(graph: PropertyGraph) -> DataFrame:
    """-> (id BIGINT, degree BIGINT, tri_cnt BIGINT, lcc DOUBLE): local
    clustering coefficient 2·T(v) / (d(v)·(d(v)−1)) over the canonical
    undirected graph, 0.0 where d < 2, rounded to 6 places for cross-engine
    compare. GraphX-roadmap surface (reference algorithms.h:217-222):
    composition of the per-vertex triangle join with an undirected degree
    aggregation — two shuffles total (the triangle join's and the degree
    groupBy's), both on vertex id, so AQE coalesces them onto one
    partitioning; no Python anywhere."""
    und = canonical_undirected(graph.edges)
    deg = undirected_degrees(und)
    tri = triangle_count_per_vertex(graph)
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce(F.col("tri_cnt"), F.lit(0)).alias("tri_cnt"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    2.0 * F.coalesce(F.col("tri_cnt"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - F.lit(1))),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("lcc"),
        )
    )


def triangle_count_per_vertex(graph: PropertyGraph) -> DataFrame:
    """-> (id BIGINT, tri_cnt BIGINT): triangles incident to each vertex
    (each triangle counted once per member vertex). Vertices in no triangle
    are omitted (join semantics) — callers left-join against vertices if a
    dense output is needed."""
    und = canonical_undirected(graph.edges)
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    # shuffle_hash for the same estimate-trap reason as triangle_count
    tri = (
        e1.join(e2.hint("shuffle_hash"), F.col("e1.b") == F.col("e2.a"))
        .join(e3.hint("shuffle_hash"),
              (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(F.col("e1.a").alias("va"), F.col("e1.b").alias("vb"), F.col("e2.b").alias("vc"))
    )
    members = (
        tri.select(F.col("va").alias("id"))
        .unionAll(tri.select(F.col("vb").alias("id")))
        .unionAll(tri.select(F.col("vc").alias("id")))
    )
    return members.groupBy("id").agg(F.count(F.lit(1)).alias("tri_cnt"))


def k_truss(graph: PropertyGraph, k: int, max_iter: int = 30) -> DataFrame:
    """-> (a BIGINT, b BIGINT, support BIGINT): edges of the k-truss — the
    maximal subgraph where every edge participates in >= k-2 triangles —
    with each surviving edge's in-truss support. The triangle analog of
    k-core (GraphX-roadmap family, reference algorithms.h:217-222):
    repeatedly count per-edge triangle support on the surviving edge set
    and drop edges below threshold, to fixpoint.

    Scale shape: each peel round is the same hinted 3-way self-join as
    ``triangle_count`` (shuffle_hash pinned — the G2 estimate trap applies
    doubly here since the edge set shrinks each round and stats are stale)
    plus one groupBy on the canonical edge key; rounds are bounded by the
    truss peel depth. Per-round localCheckpoint truncates lineage exactly
    like k_core's.

    Raises if the fixpoint is not reached within ``max_iter`` (declared-
    query convergence contract, same as k_core)."""
    if k < 2:
        raise ValueError(f"k_truss requires k >= 2, got {k}")
    from gmr_spark.plans.pregel import _drop_checkpoint_blocks

    min_support = k - 2
    # `ckpt` is the ONE eager checkpoint per round (round-4 ADVICE: a second
    # per-round checkpoint of the (a,b) projection doubled checkpoint I/O
    # for no semantic gain); `edges` is a lazy projection over it.
    ckpt = canonical_undirected(graph.edges).localCheckpoint(eager=True)
    edges = ckpt
    n_edges = edges.count()

    # live checkpoints we own — released on every non-return exit (fixpoint
    # returns remove their result first), so a mid-round executor exception
    # or max_iter exhaustion cannot leak the current round's blocks
    owned: list[DataFrame] = [ckpt]
    try:
        for _ in range(max_iter):
            if n_edges == 0:
                # the (empty) result still reads through the live checkpoint
                owned.remove(ckpt)
                return edges.select(
                    "a", "b", F.lit(0).cast("bigint").alias("support"))
            e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
            tri = (
                e1.join(e2.hint("shuffle_hash"), F.col("e1.b") == F.col("e2.a"))
                .join(e3.hint("shuffle_hash"),
                      (F.col("e3.a") == F.col("e1.a"))
                      & (F.col("e3.b") == F.col("e2.b")))
                .select(F.col("e1.a").alias("va"), F.col("e1.b").alias("vb"),
                        F.col("e2.b").alias("vc"))
            )
            # each triangle (va<vb<vc) supports its 3 member edges
            sup_rows = (
                tri.select(F.col("va").alias("a"), F.col("vb").alias("b"))
                .unionAll(tri.select(F.col("vb").alias("a"), F.col("vc").alias("b")))
                .unionAll(tri.select(F.col("va").alias("a"), F.col("vc").alias("b")))
            )
            support = sup_rows.groupBy("a", "b").agg(
                F.count(F.lit(1)).alias("support"))
            nxt = (
                edges.join(support, ["a", "b"], "left")
                .select("a", "b",
                        F.coalesce("support", F.lit(0)).cast("bigint").alias("support"))
                .filter(F.col("support") >= min_support)
                .localCheckpoint(eager=True)
            )
            owned.append(nxt)
            n_nxt = nxt.count()
            _drop_checkpoint_blocks(ckpt)
            owned.remove(ckpt)
            if n_nxt == n_edges:
                # no edge dropped -> supports are final in-truss values
                owned.remove(nxt)
                return nxt
            ckpt = nxt
            edges = nxt.select("a", "b")  # lazy over the round's checkpoint
            n_edges = n_nxt
    finally:
        for df in owned:
            _drop_checkpoint_blocks(df)

    raise AssertionError(
        f"k_truss(k={k}) did not reach the peeling fixpoint within "
        f"{max_iter} rounds — raise max_iter (and the oracle unroll K)"
    )
