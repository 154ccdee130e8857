"""CLI entry point — the ``startgmr.sh`` / ``igmr`` parity surface.

The reference's primary UX is a command line
(``startgmr.sh:12-69`` → ``mpirun -np <procs> igmr <algorithm> <partition>
<graphfile>``; defaults 3 processes / TriangleCount); this module is the
engine's equivalent::

    python -m gmr_spark <algorithm> <graphfile> [options]

so a reference user can run every ``igmr`` invocation they run today —
the three algorithms the reference implements (pagerank, sssp,
trianglecount) plus every roster stub it declares but never finished
(bfs, cc, scc, mst; ``algorithms.h:217-222``) and the engine's own
additions (kcore, lpa). The ``--partitions`` flag stands where the
reference's process count stood (its hash partitioner's fan-out,
``partition.h:276-295``); here it sets the edge-table partitioning and
Spark's parallelism does the rest.

Output: row count + a deterministic preview to stdout (the reference
prints results to stdout, ``algorithms.h:62-67``), or ``--output`` to
write parquet/orc/csv/json through the engine's sink surface.
"""

from __future__ import annotations

import argparse
import sys
import time


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m gmr_spark",
        description="Run a graph algorithm over a reference-format graph "
                    "file (header: N vertices / M edges, then 'src dst' "
                    "lines; 0- or 1-based ids auto-detected).")
    p.add_argument("algorithm",
                   choices=["pagerank", "sssp", "bfs", "trianglecount",
                            "cc", "scc", "mst", "kcore", "lpa",
                            "samplesort"],
                   help="reference names: pagerank/sssp/trianglecount "
                        "(implemented there), bfs/cc/scc/mst (its declared "
                        "stubs), samplesort (its standalone entry point 3); "
                        "kcore/lpa are engine additions")
    p.add_argument("graphfile", help="graph text file (or a directory "
                                     "written by write_graph_file); for "
                                     "samplesort: one integer per line")
    p.add_argument("--partitions", type=int, default=None,
                   help="edge-table partitions (the reference's process "
                        "count analog; default: Spark's choice)")
    p.add_argument("--source", type=int, default=1,
                   help="source vertex for sssp/bfs (reference default 1)")
    p.add_argument("--unweighted", action="store_true",
                   help="sssp: treat every edge as weight 1 (the "
                        "reference's SSSP is unit-weight)")
    p.add_argument("--k", type=int, default=None,
                   help="pagerank iterations (default 10, the reference's "
                        "k) / kcore's k (default 2) / lpa rounds (default 4)")
    p.add_argument("--damping", type=float, default=0.5,
                   help="pagerank damping (reference uses 0.5, "
                        "algorithms.h:83)")
    p.add_argument("--cpus", default=None,
                   help="local[N] cores (default $SPARK_GRAFT_CPUS or 32)")
    p.add_argument("--output", default=None,
                   help="write the result here instead of previewing")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "orc", "csv", "json"],
                   help="sink format for --output")
    p.add_argument("--show", type=int, default=10,
                   help="preview rows when not writing (default 10)")
    return p


def _run(args: argparse.Namespace):
    """-> (result DataFrame, sort columns for the deterministic preview)."""
    from gmr_spark.algorithms.cc import connected_components
    from gmr_spark.algorithms.kcore import k_core
    from gmr_spark.algorithms.lpa import label_propagation
    from gmr_spark.algorithms.mst import minimum_spanning_forest
    from gmr_spark.algorithms.pagerank import pagerank
    from gmr_spark.algorithms.scc import strongly_connected_components
    from gmr_spark.algorithms.sssp import bfs, sssp
    from gmr_spark.algorithms.triangles import triangle_count
    from gmr_spark.session import get_session
    from gmr_spark.sources.graph_file import read_graph_file

    from pyspark.sql import functions as F

    spark = get_session(f"gmr_{args.algorithm}", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if args.algorithm == "samplesort":
        # entry point 3 (SURVEY §3.3, samplesort.cpp:21-191): the
        # reference's standalone MPI sample sort of a numbers file. Spark's
        # orderBy IS that algorithm — sample, range-partition (the splitter
        # exchange), shuffle, per-partition sort; `--partitions` plays the
        # reference's process count. (The reference checkout's samplesort
        # binary no longer builds — stale testsamplesort.h include.)
        # the reference's sampledata shards are WHITESPACE-separated
        # integers (many per line, one file per process,
        # samplesort.cpp:40-58) — explode on whitespace so both that shape
        # and one-per-line files parse; a directory input reads every
        # shard, standing in for the reference's per-process files
        nums = (
            spark.read.text(args.graphfile)
            .select(F.explode(F.split(F.trim("value"), r"\s+")).alias("s"))
            .filter((F.length("s") > 0) & ~F.col("s").startswith("#"))
            .select(F.col("s").cast("bigint").alias("v"))
            .filter(F.col("v").isNotNull())
        )
        if args.partitions:
            # range partition + per-partition sort IS the sample sort at
            # the requested fan-out; chaining orderBy after it would
            # re-sample and re-exchange everything a second time into
            # spark.sql.shuffle.partitions, making --partitions a dead
            # extra shuffle
            return (nums.repartitionByRange(args.partitions, "v")
                    .sortWithinPartitions("v"), ["v"])
        return nums.orderBy("v"), ["v"]

    g = read_graph_file(spark, args.graphfile,
                        num_partitions=args.partitions)

    # per-algorithm defaults via `is None`, not `or` — `--k 0` must not be
    # silently treated as unset (round-6 ADVICE item 3); k < 1 is rejected
    # up front in main() so every branch here sees a validated positive k.
    if args.algorithm == "pagerank":
        return pagerank(g, k=10 if args.k is None else args.k,
                        damping=args.damping), ["id"]
    if args.algorithm == "sssp":
        return sssp(g, args.source, weighted=not args.unweighted), ["id"]
    if args.algorithm == "bfs":
        return bfs(g, args.source), ["id"]
    if args.algorithm == "trianglecount":
        return triangle_count(g), ["tri_cnt"]
    if args.algorithm == "cc":
        return connected_components(g), ["id"]
    if args.algorithm == "scc":
        return strongly_connected_components(g), ["id"]
    if args.algorithm == "mst":
        return minimum_spanning_forest(g), ["src", "dst"]
    if args.algorithm == "kcore":
        return k_core(g, k=2 if args.k is None else args.k), ["id"]
    if args.algorithm == "lpa":
        return label_propagation(g, k=4 if args.k is None else args.k), ["id"]
    raise AssertionError(args.algorithm)  # argparse choices prevent this


def main(argv: list[str] | None = None) -> int:
    parser = _build_parser()
    args = parser.parse_args(argv)
    if args.k is not None and args.k < 1:
        parser.error(f"--k must be >= 1 (got {args.k})")
    t0 = time.perf_counter()
    result, sort_cols = _run(args)
    if args.output:
        from gmr_spark.sources.formats import write_table
        write_table(result, args.output, fmt=args.format)
        n = None
    else:
        rows = result.orderBy(*sort_cols).limit(args.show).collect()
        n = result.count()
        header = " | ".join(f.name for f in result.schema.fields)
        print(header)
        print("-" * len(header))
        for r in rows:
            print(" | ".join(str(v) for v in r))
    wall = time.perf_counter() - t0
    where = args.output if args.output else "stdout preview"
    shown = f"{n} rows, " if n is not None else ""
    print(f"[gmr_spark] {args.algorithm} on {args.graphfile}: "
          f"{shown}{wall:.2f}s -> {where}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
