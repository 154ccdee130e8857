"""Scale-design invariants (SURVEY M6):

- partition-count invariance: the reference's PageRank divides by the LOCAL
  partition's vertex count (igmr.cpp:105), making results depend on the
  process count; this engine's results must be identical under any
  partitioning;
- 64-bit vertex ids: the reference's int32 ids (partition.h:23) cap graphs
  at 2^31 vertices; this engine must handle ids beyond 2^32;
- partitioned parquet sink round-trip (O17 at scale).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmr_spark.algorithms import pagerank, sssp
from gmr_spark.graph import PropertyGraph

EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (1, 3)]


def _graph(spark, edges, nparts):
    df = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    return PropertyGraph.from_edges(df, num_partitions=nparts)


def test_pagerank_partition_count_invariance(spark):
    results = []
    for nparts in (1, 3, 8):
        pr = pagerank(_graph(spark, EDGES, nparts), k=8)
        results.append(sorted(
            (r.id, round(r.rank, 9)) for r in pr.collect()
        ))
    assert results[0] == results[1] == results[2]


def test_64bit_vertex_ids(spark):
    big = 1 << 40
    edges = [(big + 1, big + 2), (big + 2, big + 3), (big + 1, big + 3)]
    g = _graph(spark, edges, 2)
    d = {r.id: r.dist for r in sssp(g, source=big + 1).collect()}
    assert d == {big + 1: 0.0, big + 2: 1.0, big + 3: 1.0}


def test_partitioned_parquet_sink_roundtrip(spark, tmp_path):
    out = str(tmp_path / "ranked")
    pr = pagerank(_graph(spark, EDGES, 2), k=4)
    tagged = pr.withColumn("bucket", (F.col("id") % 2).cast("int"))
    tagged.write.mode("overwrite").partitionBy("bucket").parquet(out)
    back = spark.read.parquet(out)
    assert sorted((r.id, round(r.rank, 9)) for r in back.collect()) == \
        sorted((r.id, round(r.rank, 9)) for r in tagged.collect())
    assert back.select("bucket").distinct().count() == 2
