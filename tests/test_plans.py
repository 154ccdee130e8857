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
    p = plan_of(spark, "q5_nation_revenue")
    assert p.count("BroadcastHashJoin") >= 3  # supplier, customer, nation


def test_q1_single_shuffle(spark):
    p = plan_of(spark, "q1_pricing_summary")
    # one exchange: partial agg -> shuffle on (returnflag, linestatus) -> final
    assert n_exchanges(p) == 1
    assert "HashAggregate" in p


def test_dedup_exact_single_shuffle(spark):
    p = plan_of(spark, "dedup_exact")
    assert n_exchanges(p) == 1  # shuffle on md5(text) only


def test_q18_broadcasts_having_result(spark):
    p = plan_of(spark, "q18_large_orders")
    assert "BroadcastHashJoin" in p  # tiny HAVING output broadcast to orders


def test_global_sort_rank_no_single_partition_window(spark):
    """The r01 scale-killer: row_number over an unpartitioned window funnels
    the table through ONE partition. The rewrite must keep every Window
    partitioned (per range-partition ranks) except the O(#partitions)-row
    offset window, and must carry a range exchange (the sample-sort analog)."""
    p = plan_of(spark, "global_sort_rank")
    assert "rangepartitioning" in p.lower()  # O18 sample-sort exchange
    # full-data window must be partitioned by _pid; the only SinglePartition
    # exchange allowed is the tiny per-partition-counts offset window
    for m in re.finditer(r"\(\d+\) Window", p):
        pass  # existence fine; the partition check is on exchanges below
    singles = len(re.findall(r"\(\d+\) Exchange SinglePartition", p))
    assert singles <= 1, f"expected at most the offset-table exchange, got {singles}"
    # and the offset side must reach the probe as a broadcast, not a shuffle
    assert "BroadcastHashJoin" in p


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
