"""DuckDB oracle twin for kmeans — unrolled Lloyd iterations.

Mirrors gmr_spark.algorithms.kmeans step for step: init = k lowest-id
vectors; squared-L2 distances rounded to 9 dp; argmin ties to the lowest
cluster; per-dimension means rounded to 9 dp. DuckDB-only dialect
(MATERIALIZED CTEs, generate_subscripts, list() aggregate).
"""

from __future__ import annotations


def kmeans_sql(*, k: int = 8, iters: int = 2) -> str:
    parts = [f"""WITH emb AS MATERIALIZED (
    SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS vec
    FROM embeddings
),
expl AS MATERIALIZED (
    SELECT id, generate_subscripts(vec, 1) AS pos, unnest(vec) AS val FROM emb
),
c0 AS MATERIALIZED (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cluster, vec
    FROM emb ORDER BY id LIMIT {k}
),
cexpl0 AS MATERIALIZED (
    SELECT cluster, generate_subscripts(vec, 1) AS pos, unnest(vec) AS val FROM c0
)"""]

    def assign_cte(t: int) -> str:
        return f"""a{t} AS MATERIALIZED (
    SELECT id, cluster FROM (
        SELECT x.id, c.cluster,
               ROW_NUMBER() OVER (
                   PARTITION BY x.id
                   ORDER BY ROUND(SUM((x.val - c.val) * (x.val - c.val)), 9), c.cluster
               ) AS rn
        FROM expl x JOIN cexpl{t} c ON x.pos = c.pos
        GROUP BY x.id, c.cluster
    ) r WHERE rn = 1
)"""

    def update_cte(t: int) -> str:
        return f"""cexpl{t + 1} AS MATERIALIZED (
    SELECT a.cluster, x.pos, ROUND(AVG(x.val), 9) AS val
    FROM expl x JOIN a{t} a ON a.id = x.id
    GROUP BY a.cluster, x.pos
)"""

    for t in range(iters):
        parts.append(assign_cte(t))
        parts.append(update_cte(t))
    parts.append(assign_cte(iters))
    return ",\n".join(parts) + f"\nSELECT id, cluster FROM a{iters}"


def semdedup_sql(*, k: int = 8, iters: int = 2, threshold: float = 0.30) -> str:
    """Twin of operators.dedup.semdedup_embeddings: the kmeans CTE chain
    above, then within-cluster pairwise cosine (ROUND 6) and the
    earlier-similar-neighbor retire rule. The threshold literal is rendered
    via repr() so both engines parse the identical double."""
    base = kmeans_sql(k=k, iters=iters)
    prefix = base.rsplit("\nSELECT", 1)[0]
    return f"""{prefix},
norms AS MATERIALIZED (
    SELECT id, sqrt(SUM(val * val)) AS nrm FROM expl GROUP BY id
),
pairs AS MATERIALIZED (
    SELECT x.id AS id_a, y.id AS id_b
    FROM a{iters} x JOIN a{iters} y
      ON x.cluster = y.cluster AND x.id < y.id
),
dots AS MATERIALIZED (
    SELECT p.id_a, p.id_b, SUM(qa.val * qb.val) AS dot
    FROM pairs p
    JOIN expl qa ON qa.id = p.id_a
    JOIN expl qb ON qb.id = p.id_b AND qb.pos = qa.pos
    GROUP BY p.id_a, p.id_b
),
sims AS MATERIALIZED (
    SELECT d.id_b AS id, ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
    FROM dots d
    JOIN norms na ON na.id = d.id_a
    JOIN norms nb ON nb.id = d.id_b
),
earlier AS MATERIALIZED (
    SELECT id, MAX(sim) AS max_sim_earlier,
           SUM(CASE WHEN sim >= {threshold!r}::DOUBLE THEN 1 ELSE 0 END) AS n_dup
    FROM sims GROUP BY id
)
SELECT a.id AS vec_id, a.cluster, e.max_sim_earlier,
       CAST(COALESCE(e.n_dup, 0) AS INTEGER) AS n_dup_earlier,
       COALESCE(e.n_dup, 0) = 0 AS keep
FROM a{iters} a LEFT JOIN earlier e ON e.id = a.id"""
