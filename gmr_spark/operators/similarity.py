"""Similarity search over the embeddings table (ARRAY<FLOAT>, 64-dim).

- ``cosine_topk``  — brute-force exact top-k for a query set: broadcast the
  (tiny) query side, JVM-side ``zip_with``+``aggregate`` dot products, per-
  query row_number. The baseline every ANN variant is judged against. At
  100 TB the scan side stays partitioned; only queries are broadcast.
- ``ann_sign_lsh`` — bucketed approximate variant: random-hyperplane LSH
  specialized to axis-aligned hyperplanes (bucket = sign bits of the first
  16 dims), so buckets are computable as pure column expressions on both
  engines. Candidates = same-bucket rows; exact cosine re-rank inside the
  bucket. This replaces the O(n·q) cross product with a bucket equi-join —
  the scale path for n in the billions.

Determinism: similarities are ROUND(·, 6) before ranking (fold-order float
drift is ~1e-15), ties break on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gmr_spark.sources.tables import load_tables


def _vec(col: str = "embedding") -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, v: acc + v)


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(spark: SparkSession, sf_dir: str, *, n_queries: int = 5,
                k: int = 10) -> DataFrame:
    """(query_id, neighbor_id, sim, rnk): exact top-k neighbors by cosine
    for the ``n_queries`` lowest vec_ids (self excluded)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    base = emb.select(F.col("vec_id").alias("neighbor_id"), _vec().alias("v"))
    queries = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), _vec().alias("q"))
    )
    sims = (
        base.join(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(_dot(F.col("q"), F.col("v"))
                    / (_norm(F.col("q")) * _norm(F.col("v"))), 6).alias("sim"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim", "rnk")
    )


def ann_ivf(spark: SparkSession, sf_dir: str, *, k_cells: int = 8,
            nprobe: int = 2, topk: int = 3) -> DataFrame:
    """(query_id, neighbor_id, sim, rnk): IVF-style ANN — the second scale
    path next to sign-LSH. Coarse quantizer = the ``k_cells`` lowest-id
    vectors (seed centroids, no Lloyd iterations — keeps the oracle twin
    compact); every vector is *indexed* into its nearest cell, every query
    *probes* its ``nprobe`` nearest cells, exact cosine re-ranks inside the
    probed cells. Replaces the O(n²) similarity cross-product with a
    cell-key equi-join; at 100 TB, cells are the partitioning key.

    Determinism: cell distances and cosines ROUND(·,6); ties to the lower
    cell/neighbor id.
    """
    emb = load_tables(spark, sf_dir)["embeddings"]
    df = emb.select(F.col("vec_id").alias("id"), _vec().alias("v"))
    seeds = [
        (i, list(r.v))
        for i, r in enumerate(df.orderBy("id").limit(k_cells).collect())
    ]
    cand_structs = F.array(*[
        F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(F.col("v"),
                               F.array(*[F.lit(float(x)) for x in vec]),
                               lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0), lambda acc, x: acc + x),
                6,
            ).alias("d2"),
            F.lit(int(c)).cast("int").alias("cell"),
        )
        for c, vec in seeds
    ])
    ranked_cells = df.select("id", "v", F.array_sort(cand_structs).alias("cells"))
    indexed = ranked_cells.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("nv"),
        F.col("cells")[0]["cell"].alias("cell"),
    )
    probes = ranked_cells.select(
        F.col("id").alias("query_id"), F.col("v").alias("q"),
        F.explode(F.slice("cells", 1, nprobe)).alias("probe"),
    ).select("query_id", "q", F.col("probe")["cell"].alias("cell"))

    sims = (
        probes.join(indexed, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(_dot(F.col("q"), F.col("nv"))
                    / (_norm(F.col("q")) * _norm(F.col("nv"))), 6).alias("sim"),
        )
    )  # each neighbor is indexed in exactly one cell -> no dedupe needed
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("query_id", "neighbor_id", "sim", "rnk")
    )


def ann_recall_at_k(spark: SparkSession, sf_dir: str, *, n_queries: int = 5,
                    k: int = 3) -> DataFrame:
    """(method, hits, recall): measured recall@k of both ANN paths
    (``ann_ivf``, ``ann_sign_lsh``) against the exact brute-force top-k
    (``cosine_topk``) on the same query set — turns the "standard recall
    tradeoff" claims in the bucket-cap docstrings into a declared,
    regression-guarded number. Tiny output (one row per method); the cost
    is the three underlying similarity passes, each of which keeps its own
    bucketed / broadcast plan."""
    truth = (
        cosine_topk(spark, sf_dir, n_queries=n_queries, k=10)
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id")
    )
    denom = float(n_queries * k)
    parts = []
    for method, approx in (
        ("ivf", ann_ivf(spark, sf_dir)),
        ("sign_lsh", ann_sign_lsh(spark, sf_dir)),
    ):
        cand = (
            approx.filter((F.col("query_id") < n_queries) & (F.col("rnk") <= k))
            .select("query_id", "neighbor_id")
        )
        hits = truth.join(cand, ["query_id", "neighbor_id"], "left_semi")
        parts.append(
            hits.agg(F.count(F.lit(1)).alias("hits")).select(
                F.lit(method).alias("method"),
                F.col("hits").cast("bigint").alias("hits"),
                F.round(F.col("hits") / F.lit(denom), 6).alias("recall"),
            )
        )
    return parts[0].unionByName(parts[1])


def sign_bucket(vec: F.Column, n_bits: int = 16) -> F.Column:
    """Axis-aligned sign-LSH bucket id from the first n_bits dimensions."""
    bits = [
        F.when(F.element_at(vec, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    acc = bits[0]
    for b in bits[1:]:
        acc = acc + b
    return acc.cast("bigint")


BUCKET_CAP = 256


def split_oversized_buckets(vecs: DataFrame, cap: int = BUCKET_CAP) -> DataFrame:
    """Bound LSH bucket fan-in: a bucket with ``cnt > cap`` members is split
    into ``ceil(cnt / cap)`` sub-buckets by ``id % n_sub``, and candidate
    joins key on (bucket, sub) — so one degenerate bucket (adversarial
    all-same-sign corpus) can never go quadratic; the worst join group is
    ~``cap`` rows. Cost of the bound: neighbors landing in different
    sub-buckets of a split bucket are not candidates (the standard recall
    tradeoff of bounded LSH). ``id % n_sub`` (not a salted hash) keeps the
    split reproducible in the DuckDB twin.

    Input: (id, ..., bucket). Output: same + ``sub``. The per-bucket count
    table is one row per bucket — broadcast.
    """
    counts = vecs.groupBy("bucket").agg(F.count(F.lit(1)).alias("_cnt"))
    return (
        vecs.join(F.broadcast(counts), "bucket")
        .withColumn("sub", F.pmod(F.col("id"), F.ceil(F.col("_cnt") / F.lit(float(cap)))))
        .drop("_cnt")
    )


def ann_sign_lsh(spark: SparkSession, sf_dir: str, *, k: int = 3,
                 n_bits: int = 16, bucket_cap: int = BUCKET_CAP) -> DataFrame:
    """(query_id, neighbor_id, sim, rnk): top-k same-bucket neighbors for
    EVERY vector — an all-pairs ANN pass via bucket equi-join, hot buckets
    capped (``split_oversized_buckets``)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    vecs = split_oversized_buckets(
        emb.select(
            F.col("vec_id").alias("id"), _vec().alias("v"),
            sign_bucket(_vec(), n_bits).alias("bucket"),
        ),
        bucket_cap,
    )
    a = vecs.select(F.col("id").alias("query_id"), F.col("v").alias("q"), "bucket", "sub")
    b = vecs.select(F.col("id").alias("neighbor_id"), F.col("v").alias("v"), "bucket", "sub")
    sims = (
        a.join(b, ["bucket", "sub"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(_dot(F.col("q"), F.col("v"))
                    / (_norm(F.col("q")) * _norm(F.col("v"))), 6).alias("sim"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sim", "rnk")
    )
