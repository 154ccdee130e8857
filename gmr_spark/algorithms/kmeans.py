"""K-means (Lloyd's) over an embedding column.

The reference declares a ``Kmeans`` algorithm whose body is a copy of
PageRank's — non-functional (algorithms.h:227-265). This is the real thing,
expressed Spark-first:

- *assign*: broadcast the k centroids as literal arrays; squared L2 distance
  is a JVM-side ``zip_with`` + ``aggregate`` fold over the vector (no Python
  UDF); argmin via ``array_min`` over (dist, cluster) structs — ties break to
  the lowest cluster id, deterministically.
- *update*: per-dimension mean via ``posexplode`` + groupBy — a k×dim result
  collected to the driver (tiny for any realistic k·dim, even at 100 TB).

Determinism contract with the DuckDB oracle: distances and centroid means are
rounded to 9 dp on both engines, so fold-order float drift cannot flip an
argmin (except for genuine <1e-9 ties, which the synthetic clustered data
does not produce). Init centroids = the k lowest-id vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _assign(df: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """df: (id, vec ARRAY<DOUBLE>) -> (id, cluster INT)."""
    candidates = F.array(*[
        F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("vec"),
                        F.array(*[F.lit(float(x)) for x in vec]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                9,
            ).alias("d2"),
            F.lit(int(cluster)).cast("int").alias("cluster"),
        )
        for cluster, vec in centroids
    ])
    return df.select("id", F.array_min(candidates)["cluster"].alias("cluster"))


def _update(df: DataFrame, assigned: DataFrame) -> list[tuple[int, list[float]]]:
    expl = df.select("id", F.posexplode("vec").alias("pos", "val"))
    stats = (
        expl.join(assigned, "id")
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("val"), 9).alias("val"))
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in stats:
        by_cluster.setdefault(r.cluster, {})[r.pos] = r.val
    return sorted(
        (c, [dims[p] for p in sorted(dims)]) for c, dims in by_cluster.items()
    )


def kmeans(embeddings: DataFrame, *, k: int = 8, iters: int = 2,
           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """-> (id BIGINT, cluster INT): assignment after ``iters`` full Lloyd
    iterations (plus the final re-assignment under the last centroids)."""
    df = embeddings.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    ).localCheckpoint(eager=True)

    seeds = df.orderBy("id").limit(k).collect()
    centroids = [(i, list(r.vec)) for i, r in enumerate(seeds)]
    for _ in range(iters):
        assigned = _assign(df, centroids)
        centroids = _update(df, assigned)
    return _assign(df, centroids)
