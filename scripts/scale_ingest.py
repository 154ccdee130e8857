#!/usr/bin/env python
"""Graph text-format ingest at G2-class size (O1/O17 at scale, local[32]).

Every G2-class algorithm row in SCALE.md runs on an in-memory generated
graph (matching the reference's parse-EXCLUDED timing convention); this
probe measures the file boundary itself, which a real 100 TB deployment
pays on every cold read: write the 4.8M-vertex / 110.4M-edge G2-class
ring+chords graph through ``write_graph_file(distributed=True)`` (the
executor-sharded directory shape — the only one that does not bottleneck
on a single writer), read it back with ``read_graph_file``, and verify the
round-trip (vertex/edge counts and an edge-set checksum that is invariant
under the 1-based id contract).

The reference's rank-0 parse is the comparable stage: it reads the whole
file on ONE process into a global CSR before shipping subgraphs
(partition.h:200-273) — its logs record the 69M-edge parse at ~23 s
(BASELINE.md, ~3.0M edges/s). Here both directions are executor-parallel.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("INGEST_VERTICES", 4_800_000))
SCRATCH = os.environ.get("INGEST_SCRATCH", "/tmp/ingest_scale")
CPUS = os.environ.get("INGEST_CPUS", "32")


def build_graph(spark, n: int):
    """The SCALE.md G2-class generator: ring + a chord at every power of
    two — dst = (id + 2^j) mod n, 1-based ids (the writer contract)."""
    from pyspark.sql import functions as F

    from gmr_spark.graph import PropertyGraph

    chords = (n - 1).bit_length()
    offsets = F.array(*[F.lit(2 ** j) for j in range(chords)])
    edges = (
        spark.range(n)
        .select(F.col("id"), F.explode(offsets).alias("off"))
        .select((F.col("id") + 1).alias("src"),
                (F.pmod(F.col("id") + F.col("off"), F.lit(n)) + 1).alias("dst"),
                F.lit(1.0).alias("weight"))
    )
    vertices = spark.range(1, n + 1).select(F.col("id").cast("bigint"))
    return PropertyGraph(vertices=vertices, edges=edges)


def edge_checksum(edges) -> int:
    """Order-invariant content check: sum of xxhash64(src, dst) — identical
    iff the directed edge multiset is identical. Summed in decimal(38,0):
    110M signed-long terms overflow an int64 accumulator (ANSI mode
    rejects), but stay far inside 38 digits."""
    from pyspark.sql import functions as F

    return int(edges.select(
        F.sum(F.xxhash64(F.col("src"), F.col("dst")).cast("decimal(38,0)"))
        .alias("cs")
    ).first().cs)


def main() -> None:
    from gmr_spark.session import calibration_probe, get_session
    from gmr_spark.sources.graph_file import read_graph_file, write_graph_file

    spark = get_session("ingest_scale", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    calibration_probe(spark)
    cal = calibration_probe(spark)

    if os.path.exists(SCRATCH):
        shutil.rmtree(SCRATCH)
    g = build_graph(spark, N)
    ne = g.edges.count()  # materialization cost excluded from the write wall
    cs_out = edge_checksum(g.edges)
    out = {"vertices": N, "edges": ne, "cpus": int(CPUS)}

    path = os.path.join(SCRATCH, "g2.graph")
    t0 = time.perf_counter()
    write_graph_file(g, path, distributed=True)
    w = round(time.perf_counter() - t0, 1)
    size = sum(os.path.getsize(os.path.join(path, f)) for f in os.listdir(path))
    out["write"] = {"wall_s": w, "m_edges_per_sec": round(ne / w / 1e6, 1),
                    "gb": round(size / 1e9, 2)}

    t0 = time.perf_counter()
    g2 = read_graph_file(spark, path)
    ne2 = g2.edges.count()
    r = round(time.perf_counter() - t0, 1)
    out["read"] = {"wall_s": r, "m_edges_per_sec": round(ne2 / r / 1e6, 1)}

    nv2 = g2.vertices.count()
    cs_in = edge_checksum(g2.edges)
    out["roundtrip_ok"] = bool(nv2 == N and ne2 == ne and cs_in == cs_out)
    assert out["roundtrip_ok"], (nv2, ne2, cs_in, cs_out)

    out["calibration_sec"] = cal
    out["calibration_post_sec"] = calibration_probe(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
