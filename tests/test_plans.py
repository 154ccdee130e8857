"""Physical-plan shape assertions — the scale contract, enforced.

Correctness is the oracle gate's job; these tests pin the *plans*: predicate
pushdown reaching the parquet scan, column pruning, broadcast joins on dim
tables, and single-shuffle aggregations. A regression here is invisible at
sf0.01 and catastrophic at 100 TB.
"""

from __future__ import annotations

import re

import pytest

from gmr_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def n_exchanges(plan: str) -> int:
    # formatted explain names each node twice (tree + details); count details
    return len(re.findall(r"\(\d+\) Exchange", plan))


def plan_of(spark, name: str) -> str:
    df = all_queries()[name](spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def final_plan_of(spark, name: str) -> str:
    """The EXECUTED adaptive plan (isFinalPlan=true): the module broadcast
    policy leaves SF-scaling join sides unhinted, so the broadcasts those
    joins are expected to get at small SF exist only after AQE's runtime
    conversion — the static explain shows SortMergeJoin placeholders."""
    df = all_queries()[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan[:300]
    return plan


def test_q6_pushdown_and_pruning(spark):
    p = plan_of(spark, "q6_forecast_revenue")
    pushed = re.search(r"PushedFilters: \[(.*?)\]", p).group(1)
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    schema = re.search(r"ReadSchema: struct<(.*?)>", p).group(1)
    cols = [c.split(":")[0] for c in schema.split(",")]
    assert sorted(cols) == ["l_discount", "l_extendedprice", "l_quantity", "l_shipdate"]


def test_filter_scan_pushdown(spark):
    p = plan_of(spark, "filter_scan")
    assert "PushedFilters" in p and "o_totalprice" in p.split("PushedFilters")[1].split("]")[0]
    schema = re.search(r"ReadSchema: struct<(.*?)>", p).group(1)
    # pruned to the 3 projected columns + o_orderstatus (residual filter re-check)
    assert len(schema.split(",")) == 4


def test_q5_broadcasts_dims(spark):
    """supplier/customer are unhinted (they scale with SF — module broadcast
    policy); at sf0.001 AQE must still converge every dim join to a runtime
    broadcast, so the policy costs nothing at bench scale."""
    p = final_plan_of(spark, "q5_nation_revenue")
    assert p.count("BroadcastHashJoin") >= 3  # supplier, customer, nation
    assert "SortMergeJoin" not in p


def test_q1_single_shuffle(spark):
    p = plan_of(spark, "q1_pricing_summary")
    # one exchange: partial agg -> shuffle on (returnflag, linestatus) -> final
    assert n_exchanges(p) == 1
    assert "HashAggregate" in p


def test_dedup_exact_single_shuffle(spark):
    p = plan_of(spark, "dedup_exact")
    assert n_exchanges(p) == 1  # shuffle on md5(text) only


def test_q18_broadcasts_having_result(spark):
    # the HAVING tail is SF-linear so it carries no forced hint; AQE must
    # still broadcast it to orders at runtime (thin output at small SF)
    p = final_plan_of(spark, "q18_large_orders")
    assert "BroadcastHashJoin" in p


def test_global_sort_rank_no_single_partition_window(spark):
    """The r01 scale-killer: row_number over an unpartitioned window funnels
    the table through ONE partition. The rewrite must keep every Window
    partitioned (per range-partition ranks) except the O(#partitions)-row
    offset window, and must carry a range exchange (the sample-sort analog)."""
    p = plan_of(spark, "global_sort_rank")
    assert "rangepartitioning" in p.lower()  # O18 sample-sort exchange
    # Per-Window partitioning: a partitioned Window's Arguments line carries
    # THREE bracket groups (exprs, partition spec, order spec); an
    # unpartitioned one only two. Every full-data Window must be partitioned
    # by _pid; the single unpartitioned Window allowed is the running-sum
    # offset over the O(#partitions)-row counts table.
    unpartitioned = 0
    for block in p.split("\n\n"):
        if not re.match(r"\(\d+\) Window", block):
            continue
        args = next(l for l in block.splitlines() if l.startswith("Arguments:"))
        groups = re.findall(r"\[[^\[\]]*\]", args)
        if len(groups) >= 3:
            assert "_pid" in groups[-2], f"full-data Window not partitioned by _pid: {args}"
        else:
            unpartitioned += 1
            assert "_cnt" in block, f"unpartitioned Window over non-counts input: {block}"
    assert unpartitioned <= 1, f"{unpartitioned} unpartitioned Windows, expected <=1"
    singles = len(re.findall(r"\(\d+\) Exchange SinglePartition", p))
    assert singles <= 1, f"expected at most the offset-table exchange, got {singles}"
    # and the offset side must reach the probe as a broadcast, not a shuffle
    assert "BroadcastHashJoin" in p


def test_q10_top20_is_take_ordered(spark):
    """Top-20 must plan as TakeOrderedAndProject (per-partition local top-k,
    only 20 rows per partition reach the final stage) — never a row_number
    over an unpartitioned Window, which funnels the whole per-customer
    aggregate through one task."""
    p = plan_of(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in p
    assert not re.search(r"\(\d+\) Window", p)


def test_pagerank_hub_skew_agg_is_partial_final(spark):
    """The hub fixture's hot key (hub 0, in-degree ~|lineitem|/2) must never
    cross a shuffle as raw messages: the superstep message aggregation has to
    be a two-phase HashAggregate on id, so each map task pre-combines to one
    row per destination and the hot key arrives as ≤ #partitions partial
    rows. (The final result DF is a checkpointed LogicalRDD, so this pins the
    in-loop aggregation plan instead.)"""
    from pyspark.sql import functions as F

    from gmr_spark.algorithms.pagerank import _PageRankProgram
    from gmr_spark.sources.derive import derive_graph

    g = derive_graph(spark, SF, "hub")
    out_deg = g.edges.groupBy(F.col("src").alias("deg_id")).agg(
        F.count("*").alias("deg")
    )
    edges = g.edges.join(out_deg, F.col("src") == F.col("deg_id")).select(
        "src", "dst", "deg"
    )
    prog = _PageRankProgram(n_vertices=6, damping=0.5)
    vertices = prog.init(g.vertices)
    agg = prog.aggregate(prog.messages(vertices, edges))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = agg._jdf.queryExecution().explainString(mode)
    aggs = len(re.findall(r"\(\d+\) HashAggregate", p))
    assert aggs >= 2, f"expected partial+final aggregate on id, got {aggs}"


def test_scc_backward_one_job_per_superstep(spark):
    """The backward-membership census must ride the eager localCheckpoint's
    job as an Observation — not run a second limit(1).count() action — so a
    k-superstep peel costs k+1 jobs (init checkpoint + one per superstep),
    not 2k+1."""
    from gmr_spark.algorithms.scc import _backward_members

    # directed 3-ring: root 1, backward walk reaches 3 then 2, then one
    # final no-progress superstep -> 3 supersteps + init = 4 jobs max.
    # AQE is disabled for the measurement: its per-query-stage
    # materialization spawns bookkeeping jobs (22 observed for this same
    # 4-action run) that would swamp the action count being pinned.
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src bigint, dst bigint")
    colors = spark.createDataFrame([(1, 1), (2, 1), (3, 1)], "id bigint, color bigint")
    sc = spark.sparkContext
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sc.setJobGroup("scc_census_test", "scc backward job-count pin")
        members, _state = _backward_members(colors, edges, max_iter=10)
        sc.setJobGroup(None, None)
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("scc_census_test"))
        assert n_jobs <= 4, f"expected <=4 jobs (init + 3 supersteps), got {n_jobs}"
        assert members.count() == 3
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


def test_asof_join_uses_partial_agg_not_window(spark):
    """max_by aggregation replaces the per-event row_number window: the plan
    must contain a two-phase HashAggregate (partial + final) on event_id and
    no Window at all — the partial agg caps per-event candidate fan-out
    map-side before the shuffle."""
    p = plan_of(spark, "asof_join_orders")
    assert not re.search(r"\(\d+\) Window", p), "asof should not sort per event"
    # struct-ordered max_by uses SortAggregate (complex buffer type); the
    # contract is two phases — a map-side partial plus the post-shuffle final
    aggs = len(re.findall(r"\(\d+\) (?:Hash|Sort|ObjectHash)Aggregate", p))
    assert aggs >= 2, f"expected partial+final aggregate, got {aggs}"


def test_pregel_big_graph_joins_never_broadcast(spark):
    """G2-scale regression pin: a checkpointed LogicalRDD inherits its
    ORIGIN plan's size estimate, and a generator-derived origin
    (range → explode) undercounts by the fanout — at 4.8M V / 110M E the
    static planner estimated the edge table broadcastable and OOM'd the
    driver building a 5+ GB hash relation. run_pregel defeats this with
    shuffle_hash hints on the frontier/agg sides once the counted edge or
    vertex cardinality exceeds the broadcast-plausible bound. This pins the
    mechanism: the hinted message join must plan as ShuffledHashJoin (build
    side = frontier), never BroadcastHashJoin of either side."""
    n = 2_000_000  # > run_pregel's _BIG_ROWS bound
    edges = (
        spark.range(n)
        .selectExpr("id AS src", f"(id + 1) % {n} AS dst", "1.0 AS weight")
        .localCheckpoint(eager=True)
    )
    frontier = (
        spark.range(n)
        .selectExpr("id", "CAST(0.0 AS DOUBLE) AS value", "true AS active")
        .localCheckpoint(eager=True)
        .filter("active")
    )
    f = frontier.selectExpr("id AS fid", "value AS fdist")
    hinted = edges.join(f.hint("shuffle_hash"), edges["src"] == f["fid"])
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = hinted._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan


def test_big_graph_derivations_have_no_global_window(spark):
    """The linked_lineitems/hub fixtures assign a global contiguous rid.
    The shared-SQL form (ROW_NUMBER over the whole table, fine in
    single-node DuckDB) would funnel all of lineitem through ONE Spark
    partition; derive_graph substitutes the distributed two-phase rank
    (_lineitem_base: range-shuffle + per-partition row_number + offset
    join, the global_sort_rank shape). Pin: every full-data Window node
    carries a partitionBy; only the O(#partitions) offset table may use an
    unpartitioned window."""
    from gmr_spark.sources.derive import _SPARK_BUILDERS
    from gmr_spark.sources.tables import register_views

    register_views(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name, builder in _SPARK_BUILDERS.items():
        p = builder(spark)._jdf.queryExecution().explainString(mode)
        # formatted explain details: "Arguments: [row_number() ... ], [l_orderkey ASC" etc.
        for m in re.finditer(r"\(\d+\) Window\n", p):
            detail = p[m.end():m.end() + 400]
            # the offset-table windows aggregate one row per partition and
            # may be global; the full-data row_number window must lead its
            # windowspecdefinition with the _pid partition column
            assert re.search(r"windowspecdefinition\(_pid#\d+,", detail) or \
                "row_number" not in detail, \
                f"{name}: unpartitioned full-data window:\n{detail}"


def test_q2_q20_rollup_min_is_windowed_not_self_joined(spark):
    """q2/q20 pin: the per-part best/total over the (partkey, suppkey)
    rollup must be a partkey-partitioned Window, not a rollup⋈rollup
    SortMergeJoin — the self-join formulation cost 3-4 extra exchanges.
    Also pins zero SortMergeJoins in the EXECUTED plan (the part/supplier/
    dominant sides are unhinted per the module broadcast policy, so the
    static plan now legitimately carries SMJ placeholders that AQE must
    convert to broadcasts at this SF)."""
    for name, max_exchanges in (("q2_min_cost_supplier", 3),
                                ("q20_bulk_suppliers", 4)):
        p = plan_of(spark, name)
        assert re.search(r"windowspecdefinition\(l_partkey#\d+", p), \
            f"{name}: expected partkey-partitioned window"
        assert n_exchanges(p) <= max_exchanges, \
            f"{name}: {n_exchanges(p)} exchanges"
        fp = final_plan_of(spark, name)
        assert "SortMergeJoin" not in fp, f"{name}:\n{fp[:800]}"


def test_q3_top10_is_take_ordered(spark):
    """Same pin as q10: the global top-10 must plan as
    TakeOrderedAndProject, never an unpartitioned row_number Window."""
    p = plan_of(spark, "q3_top_orders")
    assert "TakeOrderedAndProject" in p
    assert not re.search(r"\(\d+\) Window", p)


def test_pregel_big_graph_gating_end_to_end(spark, monkeypatch):
    """Executes run_pregel's gated shuffle_hash branch (not just the hint
    semantics the test above pins): with BIG_GRAPH_ROWS forced to 0 every
    graph takes the big-graph path, and results must be identical to the
    ungated run — the hints may only change physical join strategy."""
    from gmr_spark.algorithms.sssp import bfs
    from gmr_spark.sources.derive import derive_graph
    import gmr_spark.plans.pregel as P

    g = derive_graph(spark, SF, "geo", materialize=True)
    want = {(r.id, r.level) for r in bfs(g, source=0, max_iter=8).collect()}
    monkeypatch.setattr(P, "BIG_GRAPH_ROWS", 0)
    got = {(r.id, r.level) for r in bfs(g, source=0, max_iter=8).collect()}
    assert got == want and len(want) > 0


def test_zscore_window_twin_is_pure_jvm(spark):
    """zscore_events_window is the headline z-score (round-3 verdict item 5):
    the whole normalization must stay in whole-stage codegen — no Arrow/
    Python eval node anywhere in the plan (the applyInPandas variant
    zscore_events is the declared custom-Python surface, benched separately),
    and the window must be keyed (no global partition)."""
    p = plan_of(spark, "zscore_events_window")
    for node in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas",
                 "MapInPandas"):
        assert node not in p, node
    assert "Window" in p
    # the Window's partition spec carries event_type (not an empty spec)
    win_detail = p.split("Window")[1]
    assert "event_type" in win_detail


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Bucketed tables co-locate the join: writing both sides bucketed on
    the join key (bucketBy + sortBy) lets SortMergeJoin read the buckets
    directly — ZERO Exchange nodes in the joined plan. This is the 100 TB
    fact⋈fact strategy (pre-shuffle once at write time, join free forever);
    external-path tables keep the warehouse out of the repo."""
    from pyspark.sql import functions as F

    from gmr_spark.sources.tables import load_tables

    t = load_tables(spark, SF)
    # force the SMJ path: at sf0.001 either side fits a broadcast, which
    # would bypass the bucket co-location this test exists to pin
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        for name, df, cols in [
            ("b_orders", t["orders"], ["o_orderkey", "o_custkey", "o_totalprice"]),
            ("b_lineitem", t["lineitem"], ["l_orderkey", "l_quantity"]),
        ]:
            key = cols[0]
            (df.select(*cols).write.bucketBy(8, key).sortBy(key)
             .option("path", str(tmp_path / name))
             .mode("overwrite").saveAsTable(name))
        joined = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = joined._jdf.queryExecution().explainString(mode)
        assert "SortMergeJoin" in plan
        assert n_exchanges(plan) == 0, plan
        # the bucket layout also covers the groupBy on the same key
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_scd2_single_keyed_shuffle(spark):
    """SCD2 history: ONE hash exchange on the dimension key, and both window
    functions (row_number + lead) ride the same keyed Window — no
    SinglePartition anywhere (the r01 full-data-window killer)."""
    p = plan_of(spark, "scd2_order_history")
    assert n_exchanges(p) == 1, p
    assert "SinglePartition" not in p
    for block in p.split("\n\n"):
        if not re.match(r"\(\d+\) Window", block):
            continue
        args = next(l for l in block.splitlines() if l.startswith("Arguments:"))
        groups = re.findall(r"\[[^\[\]]*\]", args)
        assert len(groups) >= 3 and "o_custkey" in groups[-2], args


def test_triangle_closure_paths(spark):
    """Both closing-edge probe strategies (closed_triangles, round 5):

    - under the cap, the probe is a broadcast LEFT SEMI on the exact long
      encoding (the wedge stream never shuffles) while the wedge join
      itself stays ShuffledHashJoin;
    - cap=0 forces the >cap fallback — the shape used at 100 TB edge scale
      — which must keep the G2 estimate-trap guard: every join
      ShuffledHashJoin, no broadcast anywhere (Catalyst cannot size the
      distinct-over-checkpoint edge set and once chose to broadcast
      10.6 GiB of it, aborting the round-4 G2 TC run)."""
    p = plan_of(spark, "triangles_ring")
    assert "ShuffledHashJoin" in p, p
    assert re.search(r"BroadcastHashJoin .*LeftSemi", p), p

    from gmr_spark.algorithms.triangles import triangle_count
    from gmr_spark.sources.derive import derive_graph

    # materialize so the derivation's own joins don't pollute the TC plan
    g = derive_graph(spark, SF, "ring", materialize=True)
    df = triangle_count(g, closure_broadcast_max_edges=0)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p2 = df._jdf.queryExecution().explainString(mode)
    assert p2.count("ShuffledHashJoin") >= 2, p2
    assert "BroadcastHashJoin" not in p2


def test_minhash_verify_semi_filters_shingles(spark):
    """The 2M-doc scale fix's regression guard: the exact-Jaccard verify
    stage must reach the shingle table through a broadcast LEFT-SEMI on the
    candidate-doc id list (a map-side filter), never by reshuffling the
    full corpus shingle set for a small candidate pair set."""
    from gmr_spark.operators import dedup as D

    # the memoized result is an eager checkpoint (LogicalRDD) — pin the
    # LAZY build plan the checkpoint materializes from
    df = D._verified_pairs_plan(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = df._jdf.queryExecution().explainString(mode)
    assert re.search(r"BroadcastHashJoin .*LeftSemi", p), p


def test_pregel_adaptive_broadcast_end_to_end(spark, monkeypatch):
    """The exact-census adaptive branch (round-4 verdict item 4): with
    BIG_GRAPH_ROWS=0 and checkpoint_interval=1, small frontiers take the
    hinted-broadcast message join; results must be identical to the default
    path, and at ci=2 the gate must stay closed (census goes stale between
    checkpoints, so a hinted non-fallback broadcast would be unsafe)."""
    from gmr_spark.algorithms.sssp import _SSSPProgram, bfs
    from gmr_spark.plans.pregel import run_pregel
    from gmr_spark.sources.derive import derive_graph
    import gmr_spark.plans.pregel as P

    g = derive_graph(spark, SF, "geo", materialize=True)
    want = {(r.id, r.level) for r in bfs(g, source=0, max_iter=8).collect()}
    monkeypatch.setattr(P, "BIG_GRAPH_ROWS", 0)
    res = run_pregel(g, _SSSPProgram(0, weighted=False), max_iter=8,
                     checkpoint_interval=1)
    got = {(r.id, r.level)
           for r in res.vertices.select(
               "id", res.vertices.value.alias("level")).collect()}
    assert got == want and len(want) > 0


def test_small_loop_conf_contract(spark):
    """The round-6 loop-scoped physical conf (plans/pregel.py): below
    BIG_GRAPH_ROWS the scope coalesces shuffle partitions to ~n/75k
    (floored at 4, never above the session setting) and turns AQE off;
    above it the scope is a strict no-op; the saved conf is restored on
    clean exit, on exception, and correctly under nesting (inner scope
    saves the outer's values, not the session's)."""
    from gmr_spark.plans.pregel import (
        BIG_GRAPH_ROWS, LOOP_EDGES_PER_SHUFFLE_PARTITION, small_loop_conf)

    part_key, aqe_key = "spark.sql.shuffle.partitions", "spark.sql.adaptive.enabled"
    base = (spark.conf.get(part_key), spark.conf.get(aqe_key))
    assert base[1] == "true"  # the session default the gate must restore

    # small: coalesced + AQE off, restored on clean exit
    with small_loop_conf(spark, 300_000):
        want = max(4, -(-300_000 // LOOP_EDGES_PER_SHUFFLE_PARTITION))
        assert int(spark.conf.get(part_key)) == min(want, int(base[0]))
        assert spark.conf.get(aqe_key) == "false"
    assert (spark.conf.get(part_key), spark.conf.get(aqe_key)) == base

    # big: strict no-op (AQE's runtime re-planning earns its keep there)
    with small_loop_conf(spark, BIG_GRAPH_ROWS + 1):
        assert (spark.conf.get(part_key), spark.conf.get(aqe_key)) == base

    # exception path restores
    try:
        with small_loop_conf(spark, 100_000):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert (spark.conf.get(part_key), spark.conf.get(aqe_key)) == base

    # nesting: inner saves the OUTER scope's values and restores to them
    with small_loop_conf(spark, 1_000_000):
        outer = (spark.conf.get(part_key), spark.conf.get(aqe_key))
        with small_loop_conf(spark, 100_000):
            assert spark.conf.get(aqe_key) == "false"
        assert (spark.conf.get(part_key), spark.conf.get(aqe_key)) == outer
    assert (spark.conf.get(part_key), spark.conf.get(aqe_key)) == base


def test_multimodal_audio_is_narrow_and_prunes(spark):
    """The audio decode chain must stay shuffle-free (two partition-
    preserving MapInPandas stages) and read ONLY doc_id from the corpus —
    at 100 TB any exchange or full-width scan here is pure waste."""
    p = plan_of(spark, "multimodal_audio")
    assert n_exchanges(p) == 0
    assert p.count("MapInPandas") >= 2  # synth stage + decode stage
    assert "struct<doc_id:bigint>" in p  # text column pruned from the scan


def test_dedup_substring_broadcasts_shared_keys_no_cartesian(spark):
    """ExactSubstr's annotate join must equi-join on the window hash with
    the (tiny) shared-key set on the build side — never a cartesian — and
    the whole chain stays within 3 exchanges (count-distinct pair on the
    key census, per-doc dup agg); the window stream itself is reused via
    the eager checkpoint, not recomputed per consumer."""
    p = plan_of(spark, "dedup_substring")
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "BroadcastHashJoin" in p
    assert n_exchanges(p) <= 3


def test_dsir_select_broadcasts_ratio_and_takes_ordered(spark):
    """DSIR's per-bucket ratio table is <= 256 rows — it must reach the
    per-doc scoring join as a broadcast (never a shuffled join of the
    feature stream against it), and the final top-k must be
    TakeOrderedAndProject, not a global Sort of 2M+ scored docs."""
    p = plan_of(spark, "dsir_select")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_unigram_lm_score_explodes_corpus_twice_not_thrice(spark):
    """The corpus-LM score needs the token stream for (doc,term) counts and
    for the vocabulary census — exactly TWO Generate (explode) subtrees.
    The corpus-total T must come from a narrow array-size scan (no third
    explode replay: the regression this pins scanned the corpus 3x). The
    only cross join is the broadcast of the 1-row total."""
    p = plan_of(spark, "unigram_lm_score")
    assert len(re.findall(r"\(\d+\) Generate", p)) == 2
    assert n_exchanges(p) <= 4
    assert "CartesianProduct" not in p


def test_curation_pipeline_plan_is_jvm_semi_joins(spark):
    """Plan pin for the declared `curation` query (promoted round 13):
    the composed pipeline must stay what the module docstring promises —
    narrow-id SEMI-joins against the corpus scan, 1-row BROADCAST cross
    joins for the LM statistics (BroadcastNestedLoopJoin over a 1-row
    aggregate — never an unbounded CartesianProduct), per-lang keyed
    windows only (packing + the chain's cluster-size window — no global
    single-partition window), and pure JVM expressions end-to-end (no
    row-at-a-time Python; the dedup chain's kernels are already
    checkpoint leaves by the time the pipeline composes them)."""
    from gmr_spark.operators.dedup import clear_dedup_memo

    try:
        p = plan_of(spark, "curation")
    finally:
        clear_dedup_memo()
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    assert p.count("LeftSemi") >= 4  # keepers/survivors/good/calm stages
    # every window is keyed (partition spec non-empty): a global window
    # over per-doc rows would single-partition an SF-linear frame at
    # 100 TB. Window Arguments are [functions], [partition], [order] —
    # an empty middle list is the single-partition smell.
    win_args = re.findall(r"\(\d+\) Window[\s\S]*?Arguments: (.*)", p)
    assert win_args  # packing + the chain's windows are in this plan
    for args in win_args:
        assert "], [], [" not in args, args


def test_reset_plan_stats_releafs_checkpoints_zero_copy(spark):
    """Spark 4's localCheckpoint propagates the origin plan's ESTIMATED
    stats onto the LogicalRDD leaf, and the size-only estimator models a
    join as the product of its children's sizeInBytes — so an iterative
    self-join loop squares the BigInt per iteration and, past ~15 rounds,
    the driver stalls in million-digit BigInteger multiplies inside the
    next checkpoint's stats rewrite (measured: the Borůvka pointer-jump
    fixpoint at G2 size pinned one driver thread 20+ minutes while zero
    tasks ran). reset_plan_stats must (a) preserve rows/schema over the
    SAME persisted blocks, (b) reset sizeInBytes to the default, (c) keep
    a 20-round self-join checkpoint loop wall-bounded."""
    import time

    from pyspark.sql import functions as F

    from gmr_spark.plans.pregel import _drop_checkpoint_blocks, reset_plan_stats

    def size_of(df) -> int:
        return int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))

    base = spark.range(500).select("id", (F.col("id") * 2).alias("v")) \
        .localCheckpoint(eager=True)
    joined = base.join(base.selectExpr("id", "v as v2"), "id") \
        .localCheckpoint(eager=True)
    assert size_of(joined) < 2 ** 63  # propagated product estimate, finite
    reset = reset_plan_stats(joined)
    assert reset.schema == joined.schema
    assert reset.count() == 500
    assert size_of(reset) == 2 ** 63 - 1  # spark.sql.defaultSizeInBytes
    # the result must actually BE a fresh LogicalRDD leaf over the same
    # blocks — not the silent-fallback input (round-7 verdict item 3: on a
    # PySpark upgrade that breaks the private API this line fails loudly)
    assert reset._jdf.queryExecution().analyzed() \
        .getClass().getSimpleName() == "LogicalRDD"
    assert reset is not joined

    cur, owned = base, [base, joined]
    t0 = time.perf_counter()
    for _ in range(20):
        nxt = reset_plan_stats(
            cur.alias("a")
            .join(cur.alias("b").selectExpr("id", "v as v2"), "id")
            .select("id", "v").localCheckpoint(eager=True))
        owned.append(nxt)
        cur = nxt
    wall = time.perf_counter() - t0
    # without the reset the 20th checkpoint alone multiplies ~10M-digit
    # BigIntegers for minutes; with it the whole loop is seconds
    assert wall < 60, f"stats squaring not cut: {wall:.1f}s for 20 rounds"
    assert cur.count() == 500
    assert size_of(cur) == 2 ** 63 - 1
    for df in owned:
        _drop_checkpoint_blocks(df)


def test_private_api_fallback_warns_loudly(spark, monkeypatch):
    """When the private JVM API behind reset_plan_stats is unavailable, the
    fallback must WARN (once per process), never pass silently — a silent
    fallback reinstates the exact G2-scale pathologies (BigInteger stats
    stall, retained checkpoint blocks) with no signal (round-7 verdict
    item 3). Simulated by feeding a non-checkpointed frame, whose analyzed
    plan has no ``rdd()`` — the same failure shape as a broken API."""
    import warnings

    import gmr_spark.plans.pregel as P

    monkeypatch.setattr(P, "_WARNED_FALLBACKS", set())
    plain = spark.range(10)  # Range leaf, not LogicalRDD: rdd() raises
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = P.reset_plan_stats(plain)
    assert out is plain  # documented fallback: input unchanged
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, RuntimeWarning)]
    assert any("reset_plan_stats" in m and "private Spark JVM API" in m
               for m in msgs), msgs
    # and exactly once per process per helper — loops must not drown logs
    with warnings.catch_warnings(record=True) as again:
        warnings.simplefilter("always")
        P.reset_plan_stats(plain)
    assert not [w for w in again if issubclass(w.category, RuntimeWarning)]

    # _drop_checkpoint_blocks on a non-LogicalRDD frame is a LEGITIMATE
    # no-op (loop state variables start as LocalRelations) — never a warn
    monkeypatch.setattr(P, "_WARNED_FALLBACKS", set())
    with warnings.catch_warnings(record=True) as quiet:
        warnings.simplefilter("always")
        P._drop_checkpoint_blocks(spark.range(5))
        P._drop_checkpoint_blocks(
            spark.createDataFrame([], "id bigint"))
    assert not [w for w in quiet if issubclass(w.category, RuntimeWarning)]


def test_run_pregel_edge_checkpoint_ownership(spark):
    """Round-8 ADVICE item 3, pinned three ways.

    (a) default path: run_pregel's internal O(|E|) edge snapshot is
        released before return — the only persistent RDD a clean call may
        add is the returned state checkpoint;
    (b) ``edges_checkpointed=True``: no second edge snapshot is landed AND
        the caller's blocks survive the call (the peel-loop contract);
    (c) a mid-loop driver failure releases the in-flight state too
        (the _pregel_loop except path)."""
    from gmr_spark.algorithms.sssp import _SSSPProgram
    from gmr_spark.graph import PropertyGraph
    from gmr_spark.plans.pregel import _drop_checkpoint_blocks, run_pregel

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "src bigint, dst bigint")
    vertices = spark.createDataFrame(
        [(i,) for i in range(65)], "id bigint")

    def persistent_ids() -> set:
        # id SET, not size: the async ContextCleaner may reclaim OTHER
        # tests' stale entries mid-test, so counts drift — new ids don't
        return {int(i) for i in
                spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}

    # (a) owned edges: exactly the returned state outlives the call
    before = persistent_ids()
    res = run_pregel(PropertyGraph(vertices=vertices, edges=edges),
                     _SSSPProgram(0, weighted=False), max_iter=4)
    assert len(persistent_ids() - before) == 1, \
        "clean run_pregel must only leave its returned state resident"
    _drop_checkpoint_blocks(res.vertices)
    assert not (persistent_ids() - before)

    # (b) caller-owned edges: not copied, not released
    edges_ckpt = edges.localCheckpoint(eager=True)
    before = persistent_ids()
    res = run_pregel(PropertyGraph(vertices=vertices, edges=edges_ckpt),
                     _SSSPProgram(0, weighted=False), max_iter=4,
                     edges_checkpointed=True)
    assert len(persistent_ids() - before) == 1, \
        "edges_checkpointed call must not land a second edge snapshot"
    assert edges_ckpt.count() == 64  # caller's blocks untouched
    _drop_checkpoint_blocks(res.vertices)
    _drop_checkpoint_blocks(edges_ckpt)

    # (c) mid-loop failure: internal edges AND the last state both released
    class _Boom(_SSSPProgram):
        def __init__(self):
            super().__init__(0, weighted=False)
            self.calls = 0

        def aggregate(self, msgs):
            self.calls += 1
            if self.calls >= 3:
                raise ValueError("forced mid-loop failure")
            return super().aggregate(msgs)

    before = persistent_ids()
    with pytest.raises(ValueError, match="forced mid-loop"):
        run_pregel(PropertyGraph(vertices=vertices, edges=edges),
                   _Boom(), max_iter=8, checkpoint_interval=1)
    assert not (persistent_ids() - before), \
        "failed run_pregel leaked checkpoint blocks"


def test_cc_label_loop_releases_superseded_checkpoints(spark):
    """Round-10: _cc_labels used to leave every superseded per-round label
    checkpoint to the async ContextCleaner (the only loop that predated
    the release discipline) — a long run stranded O(rounds + jump_joins)
    |V|-row block sets. Now a clean run leaves exactly the returned label
    table resident, and its per-round checkpoints go through
    checkpoint_eager (failure-window coverage included)."""
    from gmr_spark.algorithms.cc import connected_components
    from gmr_spark.graph import PropertyGraph

    # a path graph forces several propagate+jump rounds
    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(200)],
        "src bigint, dst bigint, weight double")
    vertices = spark.createDataFrame(
        [(i,) for i in range(201)], "id bigint")

    def persistent_ids() -> set:
        return {int(i) for i in
                spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}

    before = persistent_ids()
    out = connected_components(
        PropertyGraph(vertices=vertices, edges=edges))
    assert out.groupBy("component").count().count() == 1  # one component
    leaked = persistent_ids() - before
    assert len(leaked) == 1, \
        f"cc must leave only the returned labels resident, found {leaked}"
    # the returned frame is a PROJECTION of the label checkpoint, so
    # _drop_checkpoint_blocks (LogicalRDD-root only) would silently no-op
    # on it — release the known id directly so the block store stays
    # clean for later tests
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for entry in jmap.entrySet().toArray():
        if int(entry.getKey()) in leaked:
            entry.getValue().unpersist(False)
    assert not (persistent_ids() - before)


def test_run_pregel_failure_inside_checkpoint_releases_inflight(
        spark, monkeypatch):
    """Round-9 verdict item 3: the loop's except path releases the states
    it holds BINDINGS to, but a failure landing inside the eager
    localCheckpoint call itself happens before the binding exists — the
    partially-persisted RDD used to be stranded on the async
    ContextCleaner. checkpoint_eager must unpersist whatever the failed
    materialization persisted: a run_pregel whose superstep checkpoint
    persists blocks and THEN fails must leave zero new persistent RDDs."""
    from gmr_spark.algorithms.sssp import _SSSPProgram
    from gmr_spark.graph import PropertyGraph
    from gmr_spark.plans.pregel import run_pregel

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "src bigint, dst bigint")
    vertices = spark.createDataFrame(
        [(i,) for i in range(65)], "id bigint")
    # patch the CONCRETE class (pyspark.sql.classic.dataframe.DataFrame on
    # Spark 4) — the pyspark.sql.DataFrame parent's method is overridden
    DataFrame = type(edges)

    def persistent_ids() -> set:
        return {int(i) for i in
                spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}

    real = DataFrame.localCheckpoint
    calls = {"n": 0}

    def persist_then_fail(self, eager=True):
        # the worst version of the window: the checkpoint's materializing
        # job fully persisted its blocks, then the call raised — callers
        # never receive the DataFrame, so only checkpoint_eager's id-set
        # diff can release the blocks
        out = real(self, eager=eager)
        calls["n"] += 1
        if calls["n"] >= 3:  # 1=edges snapshot, 2=init state, 3=superstep 1
            raise RuntimeError("injected failure inside localCheckpoint")
        return out

    monkeypatch.setattr(DataFrame, "localCheckpoint", persist_then_fail)
    before = persistent_ids()
    with pytest.raises(RuntimeError, match="inside localCheckpoint"):
        run_pregel(PropertyGraph(vertices=vertices, edges=edges),
                   _SSSPProgram(0, weighted=False), max_iter=8,
                   checkpoint_interval=1)
    monkeypatch.setattr(DataFrame, "localCheckpoint", real)
    leaked = persistent_ids() - before
    assert not leaked, \
        f"failure inside the eager checkpoint stranded RDDs {leaked}"


def test_checkpoint_eager_rejects_concurrent_entry(spark):
    """Round-10 verdict item 7: checkpoint_eager's single-driver-thread
    contract is cheaply ENFORCED — a second driver thread entering while a
    call is in flight (simulated by holding this context's guard) raises
    RuntimeError up front instead of silently racing the RDD-id snapshot
    and risking a live checkpoint's blocks. The guard is released on every
    exit path, so a clean call afterwards still works."""
    from gmr_spark.plans import pregel

    df = spark.range(3)
    guard = pregel._eager_guard(spark.sparkContext)
    assert guard.acquire(blocking=False)
    try:
        with pytest.raises(RuntimeError, match="concurrent entry"):
            pregel.checkpoint_eager(df)
    finally:
        guard.release()
    out = pregel.checkpoint_eager(df)
    assert out.count() == 3
    assert not guard.locked()  # released on the success path
    pregel._drop_checkpoint_blocks(out)


def test_checkpoint_eager_pair_concurrent_and_clean(spark):
    """r15: checkpoint_eager_pair materializes two independent frames'
    eager localCheckpoints under one guard acquisition (two concurrent
    jobs). Pins: (a) both results are block-backed LogicalRDD leaves with
    the right values; (b) the guard is released afterwards; (c) concurrent
    entry is rejected like checkpoint_eager's; (d) a failure inside either
    materialization releases EVERY id the call persisted."""
    from pyspark.sql import functions as F

    from gmr_spark.plans import pregel

    a = spark.range(5).select(F.col("id").alias("x"))
    b = spark.range(7).select((F.col("id") * 2).alias("y"))
    ra, rb = pregel.checkpoint_eager_pair(a, b)
    for r in (ra, rb):
        assert (r._jdf.queryExecution().analyzed().getClass().getSimpleName()
                == "LogicalRDD")
    assert ra.count() == 5 and rb.count() == 7
    guard = pregel._eager_guard(spark.sparkContext)
    assert not guard.locked()  # released on the success path
    assert guard.acquire(blocking=False)
    try:
        with pytest.raises(RuntimeError, match="concurrent entry"):
            pregel.checkpoint_eager_pair(a, b)
    finally:
        guard.release()
    pregel._drop_checkpoint_blocks(ra)
    pregel._drop_checkpoint_blocks(rb)

    # failure path: one side's materializing job fails -> nothing persisted
    # by the call survives (the snapshot-diff release covers BOTH sides)
    def persistent_ids() -> set:
        return {int(i) for i in
                spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}

    @F.udf("long")
    def _boom(v):
        raise ValueError("forced pair failure")

    before = persistent_ids()
    bad = spark.range(4).select(_boom(F.col("id")).alias("z"))
    with pytest.raises(Exception, match="forced pair failure"):
        pregel.checkpoint_eager_pair(spark.range(3), bad)
    assert not (persistent_ids() - before), \
        "failed checkpoint_eager_pair leaked persisted RDDs"
    assert not pregel._eager_guard(spark.sparkContext).locked()


def test_eager_guard_keyed_per_context(spark):
    """Round-11 ADVICE item 4: the reentrancy guard is keyed per
    SparkContext — the RDD-id snapshot race it protects is per-context, so
    two independent contexts must get independent locks (no spurious
    'concurrent entry' across contexts), while repeat lookups on the SAME
    context return the SAME lock. Spark forbids two live contexts in one
    process, so the second key is a stand-in object — _eager_guard is
    key-agnostic by construction. Weak keying: dropping the key frees its
    entry (a lock must not keep a stopped context alive)."""
    from gmr_spark.plans import pregel

    class _FakeContext:
        pass

    sc = spark.sparkContext
    assert pregel._eager_guard(sc) is pregel._eager_guard(sc)
    other = _FakeContext()
    assert pregel._eager_guard(other) is not pregel._eager_guard(sc)
    # holding the OTHER context's guard must not block this context's call
    assert pregel._eager_guard(other).acquire(blocking=False)
    try:
        out = pregel.checkpoint_eager(spark.range(2))
        assert out.count() == 2
        pregel._drop_checkpoint_blocks(out)
    finally:
        pregel._eager_guard(other).release()
    before = len(pregel._EAGER_GUARDS)
    del other
    import gc

    gc.collect()
    assert len(pregel._EAGER_GUARDS) == before - 1


def test_python_worker_prewarm_runs_clean(spark):
    """r15: the session-start Python-worker pre-warm (§4.5 — absorbs the
    ~1.8 s/worker Arrow cold-start otherwise billed to the first ANN /
    multimodal query) must actually RUN. It is wrapped in a
    warn-and-continue except, so a silently broken warm-up (e.g. the
    string-annotation pandas_udf signature this test was written against)
    still passes every functional test — pin that it executes without
    falling into the warning path, and that repeat calls are memoized."""
    import warnings

    from gmr_spark import session as S

    app_id = spark.sparkContext.applicationId
    S._PREWARMED_APPS.discard(app_id)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        S._prewarm_python_workers(spark)
    assert not [w for w in caught if "pre-warm failed" in str(w.message)], \
        "python worker pre-warm fell into its failure path"
    assert app_id in S._PREWARMED_APPS
    # memoized: a second call is a no-op (no second noop-write job)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        S._prewarm_python_workers(spark)
    assert not caught
