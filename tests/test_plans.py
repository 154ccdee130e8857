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
