"""Reader for the reference's graph text format (operator O1).

Format (partition.h:112-153 + graph/small.graph):
  line 1: vertex count
  line 2: directed edge count
  then one ``from to`` pair per line; ``#`` comment lines and blank lines are
  skipped (partition.h:99-100,131-132); 0-based inputs are shifted to 1-based
  (partition.h:147-148); gaps in the id sequence become isolated vertices
  (partition.h:243-255).

Unlike the reference's single-reader rank-0 parse (23 s for 69M edges,
log.txt line 1), this is a distributed ``spark.read.text`` scan: the header is
read driver-side (2 tiny lines), the edge body is parsed across executors, so
parse time scales with cluster size instead of one process.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from gmr_spark.graph import PropertyGraph


def read_graph_file(spark: SparkSession, path: str, num_partitions: int | None = None) -> PropertyGraph:
    lines = spark.read.text(path)
    body = lines.filter(
        (F.length(F.trim("value")) > 0) & ~F.trim("value").startswith("#")
    )
    # header = first two non-comment lines (vertex count, edge count)
    header = [r.value.strip() for r in body.limit(2).collect()]
    nvtxs, nedges = int(header[0]), int(header[1])

    pairs = (
        body.select(F.split(F.trim("value"), r"\s+").alias("p"))
        .filter(F.size("p") == 2)
        .select(
            F.col("p")[0].cast("bigint").alias("src"),
            F.col("p")[1].cast("bigint").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    # drop the header rows themselves if they parsed as single-field lines;
    # a "N" header line splits to size 1 so the size==2 filter removed it.
    min_id = pairs.agg(F.least(F.min("src"), F.min("dst"))).first()[0]
    if min_id == 0:  # 0-based input -> shift to 1-based (partition.h:147-148)
        pairs = pairs.select((F.col("src") + 1).alias("src"), (F.col("dst") + 1).alias("dst"))
    edges = pairs.withColumn("weight", F.lit(1.0))

    g = PropertyGraph.from_edges(edges, num_partitions=num_partitions)
    # back-fill id gaps as isolated vertices (partition.h:243-255)
    all_ids = spark.range(1, nvtxs + 1).select(F.col("id").cast("bigint"))
    g = PropertyGraph(vertices=all_ids, edges=g.edges)
    g.declared_counts = (nvtxs, nedges)  # type: ignore[attr-defined]
    return g
