#!/usr/bin/env python
"""TPC-H relational suite at scale-class volume (local[32]).

The graph family (scale_g2), the LLM operators (scale_llm), streaming
(scale_stream) and SVD++ (scale_svdpp) all carry SCALE.md rows measured
far above the sf0.1 bench size; this probe adds the missing relational
family: the heaviest TPC-H shapes on a corpus ~200x sf0.1 (lineitem 120M
rows, orders 30M, customer 3M, part 4M, supplier 200k), so "would this
join/agg survive a 100x scale-up" is answered by measurement, not plan
inspection.

Method: synthesize all ten driver tables with the driver's exact schema
and value domains (same columns, types, date ranges, flag/priority/
segment/brand/type alphabets — verified against /root/testdata; xxhash64-
seeded pseudo-randoms, so the build is deterministic and shuffle-free),
write them as {scratch}/{t}.parquet, and run the DECLARED query functions
unmodified via their (spark, sf_dir) contract with bench.py's noop-write
materialization. Walls are min-of-2 with the shared calibration probe
before/after (SCALE.md methodology).

Lineitem fan-out mirrors the testdata: 1-7 lines per order (avg 4), so
q18's total_qty > 250 HAVING keeps its rare-tail selectivity and q21's
countDistinct(l_suppkey) > 1 correlation stays meaningfully multi-valued.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 200x sf0.1 by default: lineitem ~120M rows
N_ORDERS = int(os.environ.get("TPCH_ORDERS", 30_000_000))
SCRATCH = os.environ.get("TPCH_SCRATCH", "/tmp/tpch_scale")
CPUS = os.environ.get("TPCH_CPUS", "32")

QUERIES = (
    "q1_pricing_summary",   # scan + 6-agg rollup over all of lineitem
    "q3_top_orders",        # fact-fact shuffle join + top-k
    "q5_nation_revenue",    # 5-way join, local-supplier predicate
    "q6_forecast_revenue",  # pushdown canary: filters reach the scan
    "q9_product_profit",    # 5-way join + 2-key agg over a part slice
    "q13_customer_distribution",  # left-outer join + stacked aggs
    "q18_large_orders",     # HAVING subquery feeding broadcast joins
    "q21_waiting_suppliers",  # EXISTS/NOT-EXISTS double correlation
)


def _h(seed, *cols):
    """Deterministic uniform pseudo-random in [0, 2^63): xxhash64 over the
    row id (plus any extra columns) with a per-column seed literal."""
    from pyspark.sql import functions as F

    return F.abs(F.xxhash64(*cols, F.lit(seed)))


def build_tpch(spark, n_orders: int, scratch: str) -> str:
    from pyspark.sql import functions as F

    if os.path.exists(scratch):
        shutil.rmtree(scratch)
    os.makedirs(scratch)

    n_cust = n_orders // 10
    n_part = max(1, n_orders * 2 // 15)
    n_supp = max(1, n_orders // 150)
    pm = lambda seed, n, *cols: F.pmod(_h(seed, *(cols or (F.col("id"),))), F.lit(n))
    pick = lambda seed, *vals: F.element_at(
        F.array(*[F.lit(v) for v in vals]), (pm(seed, len(vals)) + 1).cast("int"))
    day0 = F.lit("1995-01-01 00:00:00").cast("timestamp")

    def write(df, name, parts):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{scratch}/{name}.parquet")

    write(spark.range(5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.element_at(
            F.array(F.lit("AFRICA"), F.lit("AMERICA"), F.lit("ASIA"),
                    F.lit("EUROPE"), F.lit("MIDDLE EAST")),
            (F.col("id") + 1).cast("int")).alias("r_name")), "region", 1)

    write(spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        F.pmod(F.col("id"), F.lit(5)).cast("int").alias("n_regionkey")),
        "nation", 1)

    write(spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("c_name"),
        pm(11, 25).cast("int").alias("c_nationkey"),
        F.round(pm(12, 1_100_000) / 100.0 - 1000.0, 2).alias("c_acctbal"),
        pick(13, "AUTOMOBILE", "BUILDING", "FURNITURE",
             "HOUSEHOLD", "MACHINERY").alias("c_mktsegment")),
        "customer", 16)

    write(spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("s_name"),
        pm(21, 25).cast("int").alias("s_nationkey"),
        F.round(pm(22, 1_000_000) / 100.0, 2).alias("s_acctbal")),
        "supplier", 4)

    write(spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            pick(31, "large", "hot", "blue", "old", "cold",
                 "small", "dark", "pale"),
            F.lit(" "),
            pick(32, "ring", "bolt", "plate", "screw", "washer",
                 "nut", "gear", "axle", "pin", "rod")).alias("p_name"),
        F.concat(F.lit("Brand#"), (pm(33, 25) + 1).cast("string")).alias("p_brand"),
        pick(34, "LARGE", "ECONOMY", "SMALL", "STANDARD",
             "MEDIUM", "PROMO").alias("p_type"),
        (pm(35, 50) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + pm(36, 10_000_000) / 100.0, 2).alias("p_retailprice")),
        "part", 16)

    write(spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        pm(41, n_cust).alias("o_custkey"),
        pick(42, "F", "O", "P").alias("o_orderstatus"),
        F.round(F.lit(1000.0) + pm(43, 49_900_000) / 100.0, 2).alias("o_totalprice"),
        F.timestamp_add("DAY", pm(44, 2400).cast("int"), day0).alias("o_orderdate"),
        pick(45, "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW").alias("o_orderpriority")),
        "orders", 32)

    ln = F.col("ln")
    li = (
        spark.range(n_orders)
        .select(F.col("id"),
                F.explode(F.sequence(F.lit(1), (pm(51, 7) + 1).cast("int"))).alias("ln"))
        .select(
            F.col("id").alias("l_orderkey"),
            F.pmod(_h(52, F.col("id"), ln), F.lit(n_part)).alias("l_partkey"),
            F.pmod(_h(53, F.col("id"), ln), F.lit(n_supp)).alias("l_suppkey"),
            ln.cast("int").alias("l_linenumber"),
            (F.pmod(_h(54, F.col("id"), ln), F.lit(50)) + 1).cast("double").alias("l_quantity"),
            F.round(F.lit(900.0) + F.pmod(_h(55, F.col("id"), ln), F.lit(10_410_000)) / 100.0, 2).alias("l_extendedprice"),
            (F.pmod(_h(56, F.col("id"), ln), F.lit(11)) / 100.0).alias("l_discount"),
            (F.pmod(_h(57, F.col("id"), ln), F.lit(9)) / 100.0).alias("l_tax"),
            F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                         (F.pmod(_h(58, F.col("id"), ln), F.lit(3)) + 1).cast("int")).alias("l_returnflag"),
            F.element_at(F.array(F.lit("F"), F.lit("O")),
                         (F.pmod(_h(59, F.col("id"), ln), F.lit(2)) + 1).cast("int")).alias("l_linestatus"),
            F.timestamp_add("DAY", (F.pmod(_h(60, F.col("id"), ln), F.lit(2500))).cast("int"),
                            F.lit("1995-01-02 00:00:00").cast("timestamp")).alias("l_shipdate"),
        )
    )
    write(li, "lineitem", 64)

    # tiny non-relational tables so load_tables' full-catalog callers work
    write(spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_add("SECOND", F.col("id").cast("int"), day0).alias("ts"),
        pm(71, 10).alias("user_id"),
        pick(72, "view", "click", "purchase").alias("event_type"),
        (pm(73, 1000) / 10.0).alias("value"),
        F.lit("{}").alias("props")), "events", 1)
    write(spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit("tiny placeholder corpus").alias("text"),
        F.lit("en").alias("lang"), F.lit("src0").alias("source"),
        F.lit(23).cast("long").alias("n_chars")), "documents", 1)
    write(spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.array(*[F.lit(0.1)] * 8).alias("embedding")), "embeddings", 1)
    return scratch


def main() -> None:
    from gmr_spark.queries import all_queries
    from gmr_spark.session import calibration_probe, get_session

    spark = get_session("tpch_scale", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    calibration_probe(spark)
    cal = calibration_probe(spark)

    t0 = time.perf_counter()
    sf = build_tpch(spark, N_ORDERS, SCRATCH)
    n_li = spark.read.parquet(f"{sf}/lineitem.parquet").count()
    build_s = round(time.perf_counter() - t0, 1)
    out = {"orders": N_ORDERS, "lineitem": n_li, "cpus": int(CPUS),
           "build_s": build_s, "queries": {}}

    registry = all_queries()

    def run_once(name: str) -> float:
        t = time.perf_counter()
        registry[name](spark, sf).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t, 1)

    for name in QUERIES:
        w = min(run_once(name), run_once(name))  # min-of-2 (SCALE.md method)
        out["queries"][name] = {
            "wall_s": w, "m_lineitem_rows_per_sec": round(n_li / w / 1e6, 1)}
        print(f"  {name}: {w}s", file=sys.stderr)

    out["calibration_sec"] = cal
    out["calibration_post_sec"] = calibration_probe(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
