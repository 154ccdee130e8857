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
