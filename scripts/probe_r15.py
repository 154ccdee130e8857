#!/usr/bin/env python
"""Round-14 optimization probes (guide §1: measure first).

Modes:
  python scripts/probe_r15.py rows q1 q2 ...     # per-query: construction
      wall (driver-side collects/planning) vs noop-write wall, min-of-2,
      bench-identical session + cleanup between runs
  python scripts/probe_r15.py explain q1 ...     # .explain("formatted") ->
      plans/r15/<q>_<suffix>.txt  (suffix from $PROBE_SUFFIX, default
      "before")
  python scripts/probe_r15.py jobs q1 ...        # per-query Spark job list
      (UI REST) — job descriptions + durations, to see where a row's wall
      goes

Not part of the bench contract; local iteration only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SUFFIX = os.environ.get("PROBE_SUFFIX", "before")


def get_probe_session(with_ui: bool):
    """bench-identical session; optionally with the UI on so the REST API
    exposes per-job timings (the bench itself keeps the UI off)."""
    from gmr_spark.session import get_session

    if not with_ui:
        return get_session("gmr_probe_r15", cpus=CPUS)
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("gmr_probe_r15_ui")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.default.parallelism", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.maxResultSize", "8g")
        .getOrCreate()
    )


def build_queries(spark):
    from gmr_spark.operators.dedup import _verified_jaccard_pairs
    from gmr_spark.queries import BENCH_ONLY_QUERIES, all_queries

    queries = {**all_queries(), **BENCH_ONLY_QUERIES}
    queries["dedup_pair_chain"] = (
        lambda s, sf: _verified_jaccard_pairs(s, sf).select("doc_a", "doc_b"))

    def _derive_all(s, sf):
        from concurrent.futures import ThreadPoolExecutor

        from gmr_spark.sources.derive import derive_graph, register_views

        register_views(s, sf)
        names = ("geo", "cs", "ring", "hub", "hub_tri", "linked_lineitems")

        def _one(n):
            return (n, derive_graph(s, sf, n, materialize=True).edges.count())

        with ThreadPoolExecutor(max_workers=3) as ex:
            rows = sorted(ex.map(_one, names))
        return s.createDataFrame(rows, "graph string, n_edges long")

    queries["derive_graphs"] = _derive_all
    return queries


def cleanup(spark):
    import gc

    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def mode_rows(names):
    spark = get_probe_session(with_ui=False)
    queries = build_queries(spark)
    # warm codegen path
    queries["filter_scan"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    cleanup(spark)
    print(f"{'query':32s} {'build1':>7s} {'write1':>7s} {'build2':>7s} {'write2':>7s}")
    for name in names:
        row = [name]
        for _ in range(2):
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            row.extend([t1 - t0, t2 - t1])
            cleanup(spark)
        print(f"{row[0]:32s} {row[1]:7.2f} {row[2]:7.2f} {row[3]:7.2f} {row[4]:7.2f}",
              flush=True)


def mode_explain(names):
    spark = get_probe_session(with_ui=False)
    queries = build_queries(spark)
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


def mode_jobs(names):
    import json
    import urllib.request

    spark = get_probe_session(with_ui=True)
    queries = build_queries(spark)
    queries["filter_scan"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    cleanup(spark)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_after(job_floor):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            data = json.loads(r.read())
        return [j for j in data if j["jobId"] > job_floor]

    for name in names:
        before = jobs_after(-1)
        floor = max((j["jobId"] for j in before), default=-1)
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        spark.sparkContext.setJobDescription(None)
        print(f"\n=== {name}: build {t1-t0:.2f}s write {t2-t1:.2f}s")
        for j in sorted(jobs_after(floor), key=lambda j: j["jobId"]):
            from datetime import datetime

            def ms(s):
                return datetime.strptime(
                    s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

            dur = (ms(j["completionTime"]) - ms(j["submissionTime"])
                   if j.get("completionTime") else float("nan"))
            print(f"  job {j['jobId']:4d} {dur:7.2f}s tasks={j['numTasks']:5d} "
                  f"stages={len(j['stageIds']):2d} {j.get('description','')[:70]}")
        cleanup(spark)


if __name__ == "__main__":
    mode, names = sys.argv[1], sys.argv[2:]
    {"rows": mode_rows, "explain": mode_explain, "jobs": mode_jobs}[mode](names)
