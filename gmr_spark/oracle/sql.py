"""DuckDB oracle twins for the graph algorithms (SURVEY §5 test strategy).

Iterative algorithms are expressed as *chained CTEs* — one CTE per superstep,
unrolled K steps — mirroring the engine's update rule exactly. Because the
engine's updates are monotone (SSSP/CC) or fixed-k (PageRank), a converged
engine run equals the K-step unrolled SQL for any K ≥ the convergence step.

Every SQL string is pure ANSI in the Spark-SQL ∩ DuckDB dialect intersection,
over the driver's pre-registered parquet views, with the graph derivations
from ``gmr_spark.sources.derive`` inlined — so both engines read identical
bytes (FIXTURES.md §4).
"""

from __future__ import annotations

from gmr_spark.sources.derive import GRAPH_SQL

_VERTICES = """
vertices AS MATERIALIZED (
    SELECT DISTINCT src AS id FROM edges
    UNION
    SELECT DISTINCT dst AS id FROM edges
)"""


def _graph_ctes(graph: str, *, undirected: bool = False) -> str:
    """WITH-clause prefix: edges (+ symmetric closure) + vertices.

    ``AS MATERIALIZED`` is DuckDB-only syntax — fine here because oracle SQL
    runs only in DuckDB (Spark executes the DataFrame engine instead). It
    forces each unrolled superstep to be evaluated once (no exponential CTE
    re-expansion, no per-reference parquet re-open).
    """
    base = GRAPH_SQL[graph].strip()
    if undirected:
        edges = f"""e_base AS MATERIALIZED (
{base}
),
edges AS MATERIALIZED (
    SELECT src, dst, weight FROM e_base
    UNION
    SELECT dst AS src, src AS dst, weight FROM e_base
)"""
    else:
        edges = f"""edges AS MATERIALIZED (
{base}
)"""
    return f"WITH {edges},{_VERTICES}"


def sssp_sql(graph: str, source: int | str, k: int, *, unit: bool = False,
             undirected: bool = False, dist_col: str = "dist") -> str:
    """K-step Bellman-Ford relaxation; NULL = unreachable.

    ``source`` may be an int literal or a SQL scalar expression (e.g.
    ``(SELECT MIN(id) FROM vertices)``).
    """
    w = "CAST(1.0 AS DOUBLE)" if unit else "e.weight"
    steps = [
        f"d0 AS MATERIALIZED (SELECT id, CASE WHEN id = {source} THEN CAST(0.0 AS DOUBLE) END AS dist FROM vertices)"
    ]
    for i in range(1, k + 1):
        p = f"d{i - 1}"
        steps.append(f"""d{i} AS MATERIALIZED (
    SELECT v.id,
           CASE WHEN m.nd IS NULL THEN v.dist
                WHEN v.dist IS NULL THEN m.nd
                WHEN m.nd < v.dist THEN m.nd
                ELSE v.dist END AS dist
    FROM {p} v
    LEFT JOIN (
        SELECT e.dst AS id, MIN(p.dist + {w}) AS nd
        FROM {p} p JOIN edges e ON e.src = p.id
        WHERE p.dist IS NOT NULL
        GROUP BY e.dst
    ) m ON m.id = v.id
)""")
    return (
        f"{_graph_ctes(graph, undirected=undirected)},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, dist AS {dist_col} FROM d{k}"
    )


def bfs_sql(graph: str, source: int | str, k: int, *, undirected: bool = False) -> str:
    return sssp_sql(graph, source, k, unit=True, undirected=undirected,
                    dist_col="level")


def landmarks_sql(graph: str, landmarks: list[int], k: int) -> str:
    """GraphX-library shortestPaths twin: K-step unit BFS unrolled once per
    landmark inside one WITH, final projection one dist_l{i} column per
    landmark (NULL = unreachable)."""
    steps = []
    for li, src in enumerate(landmarks):
        steps.append(
            f"l{li}_d0 AS MATERIALIZED (SELECT id, CASE WHEN id = {src} "
            f"THEN CAST(0.0 AS DOUBLE) END AS dist FROM vertices)")
        for i in range(1, k + 1):
            p = f"l{li}_d{i - 1}"
            steps.append(f"""l{li}_d{i} AS MATERIALIZED (
    SELECT v.id,
           CASE WHEN m.nd IS NULL THEN v.dist
                WHEN v.dist IS NULL THEN m.nd
                WHEN m.nd < v.dist THEN m.nd
                ELSE v.dist END AS dist
    FROM {p} v
    LEFT JOIN (
        SELECT e.dst AS id, MIN(p.dist + CAST(1.0 AS DOUBLE)) AS nd
        FROM {p} p JOIN edges e ON e.src = p.id
        WHERE p.dist IS NOT NULL
        GROUP BY e.dst
    ) m ON m.id = v.id
)""")
    cols = ", ".join(
        f"t{li}.dist AS dist_l{li}" for li in range(len(landmarks)))
    joins = "".join(
        f" JOIN l{li}_d{k} t{li} ON t{li}.id = t0.id"
        for li in range(1, len(landmarks)))
    return (
        f"{_graph_ctes(graph)},\n"
        + ",\n".join(steps)
        + f"\nSELECT t0.id, {cols} FROM l0_d{k} t0{joins}"
    )


def pagerank_sql(graph: str, k: int, *, damping: float = 0.5,
                 round_to: int = 6) -> str:
    """Fixed-k PageRank, reference semantics with global-N fix (FIXTURES §3.7)."""
    steps = [
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM vertices)",
        "r0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS pr FROM vertices)",
    ]
    for i in range(1, k + 1):
        p = f"r{i - 1}"
        steps.append(f"""r{i} AS MATERIALIZED (
    SELECT v.id,
           CASE WHEN m.s IS NOT NULL
                THEN {damping} * m.s + {1.0 - damping} / (SELECT n FROM nv)
                ELSE v.pr END AS pr
    FROM {p} v
    LEFT JOIN (
        SELECT e.dst AS id, SUM(p.pr / g.outdeg) AS s
        FROM {p} p
        JOIN edges e ON e.src = p.id
        JOIN deg g ON g.id = p.id
        GROUP BY e.dst
    ) m ON m.id = v.id
)""")
    return (
        f"{_graph_ctes(graph)},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, ROUND(pr, {round_to}) AS pr FROM r{k}"
    )


def cc_sql(graph: str, k: int, *, undirected: bool = True) -> str:
    """K-step min-label propagation over the symmetric closure."""
    steps = ["c0 AS MATERIALIZED (SELECT id, id AS component FROM vertices)"]
    for i in range(1, k + 1):
        p = f"c{i - 1}"
        steps.append(f"""c{i} AS MATERIALIZED (
    SELECT v.id,
           CASE WHEN m.ml IS NOT NULL AND m.ml < v.component THEN m.ml
                ELSE v.component END AS component
    FROM {p} v
    LEFT JOIN (
        SELECT e.dst AS id, MIN(p.component) AS ml
        FROM {p} p JOIN edges e ON e.src = p.id
        GROUP BY e.dst
    ) m ON m.id = v.id
)""")
    return (
        f"{_graph_ctes(graph, undirected=undirected)},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, component FROM c{k}"
    )


def lpa_sql(graph: str, k: int) -> str:
    """K-step synchronous label propagation, ties to the smallest label —
    the unrolled twin of ``algorithms.lpa.label_propagation``."""
    steps = ["l0 AS MATERIALIZED (SELECT id, id AS lbl FROM vertices)"]
    for i in range(1, k + 1):
        p = f"l{i - 1}"
        steps.append(f"""l{i} AS MATERIALIZED (
    SELECT v.id, COALESCE(m.lbl, v.lbl) AS lbl
    FROM {p} v
    LEFT JOIN (
        SELECT id, lbl FROM (
            SELECT id, lbl,
                   ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
            FROM (
                SELECT e.dst AS id, p.lbl AS lbl, COUNT(*) AS c
                FROM {p} p JOIN edges e ON e.src = p.id
                GROUP BY e.dst, p.lbl
            ) g
        ) r WHERE rn = 1
    ) m ON m.id = v.id
)""")
    return (
        f"{_graph_ctes(graph)},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, lbl AS label FROM l{k}"
    )


def triangle_sql(graph: str) -> str:
    return f"""{_graph_ctes(graph)},
und AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
)
SELECT COUNT(*) AS tri_cnt
FROM und e1
JOIN und e2 ON e1.b = e2.a
JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b"""


def clustering_sql(graph: str) -> str:
    """Local clustering coefficient twin of algorithms.triangles.local_clustering:
    per-vertex triangle incidence over the canonical undirected graph, LCC =
    2T/(d(d-1)) rounded to 6, 0.0 where d < 2."""
    return f"""{_graph_ctes(graph)},
und AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
deg AS MATERIALIZED (
    SELECT id, COUNT(*) AS degree FROM (
        SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und
    ) GROUP BY id
),
tri_raw AS MATERIALIZED (
    SELECT e1.a AS va, e1.b AS vb, e2.b AS vc
    FROM und e1
    JOIN und e2 ON e1.b = e2.a
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
tri AS MATERIALIZED (
    SELECT id, COUNT(*) AS tri_cnt FROM (
        SELECT va AS id FROM tri_raw
        UNION ALL SELECT vb FROM tri_raw
        UNION ALL SELECT vc FROM tri_raw
    ) GROUP BY id
)
SELECT d.id, d.degree,
       COALESCE(t.tri_cnt, CAST(0 AS BIGINT)) AS tri_cnt,
       ROUND(CASE WHEN d.degree >= 2
                  THEN 2.0 * COALESCE(t.tri_cnt, 0)
                       / (d.degree * (d.degree - 1))
                  ELSE 0.0 END, 6) AS lcc
FROM deg d LEFT JOIN tri t ON t.id = d.id"""


def kcore_sql(graph: str, k: int, iters: int) -> str:
    """k-core peeling unrolled ``iters`` times (exact when iters >= the peel
    depth — the engine side raises if its fixpoint needs more, same contract
    as the other K-bounded oracles in this module). alive0 filters on
    full-graph degree; alive{{i}} recomputes degree induced on alive{{i-1}};
    at the fixpoint the surviving rows carry their in-core degree."""
    steps = [f"""alive0 AS MATERIALIZED (
    SELECT a AS id, COUNT(*) AS deg FROM sym GROUP BY a
    HAVING COUNT(*) >= {k}
)"""]
    for i in range(1, iters + 1):
        steps.append(f"""alive{i} AS MATERIALIZED (
    SELECT s.a AS id, COUNT(*) AS deg
    FROM sym s
    JOIN alive{i - 1} x ON s.a = x.id
    JOIN alive{i - 1} y ON s.b = y.id
    GROUP BY s.a
    HAVING COUNT(*) >= {k}
)""")
    return f"""{_graph_ctes(graph)},
und AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
sym AS MATERIALIZED (
    SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
),
""" + ",\n".join(steps) + f"""
SELECT id, deg AS core_degree FROM alive{iters}"""


def ktruss_sql(graph: str, k: int, iters: int) -> str:
    """k-truss peeling unrolled ``iters`` times (exact when iters >= the
    peel depth; the engine raises if its fixpoint needs more). Each round:
    enumerate triangles a<b<c on the surviving canonical edge set, count
    per-edge support, keep support >= k-2; the final round's support column
    is the in-truss value."""
    ms = k - 2
    steps = ["t0_e AS MATERIALIZED (SELECT a, b FROM und)"]
    for i in range(1, iters + 1):
        p = f"t{i - 1}_e"
        steps.append(f"""t{i}_tri AS MATERIALIZED (
    SELECT e1.a AS va, e1.b AS vb, e2.b AS vc
    FROM {p} e1
    JOIN {p} e2 ON e1.b = e2.a
    JOIN {p} e3 ON e3.a = e1.a AND e3.b = e2.b
)""")
        steps.append(f"""t{i}_s AS MATERIALIZED (
    SELECT a, b, COUNT(*) AS support FROM (
        SELECT va AS a, vb AS b FROM t{i}_tri
        UNION ALL SELECT vb, vc FROM t{i}_tri
        UNION ALL SELECT va, vc FROM t{i}_tri
    ) GROUP BY a, b
)""")
        steps.append(f"""t{i}_e AS MATERIALIZED (
    SELECT e.a, e.b, CAST(COALESCE(s.support, 0) AS BIGINT) AS support
    FROM {p} e
    LEFT JOIN t{i}_s s ON s.a = e.a AND s.b = e.b
    WHERE COALESCE(s.support, 0) >= {ms}
)""")
    return f"""{_graph_ctes(graph)},
und AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
""" + ",\n".join(steps) + f"""
SELECT a, b, support FROM t{iters}_e"""


def assortativity_sql(graph: str) -> str:
    """Degree-assortativity twin: Pearson correlation of endpoint degrees
    over the SYMMETRIC canonical edge list (each undirected edge contributes
    both (du,dv) and (dv,du), so Σx=Σy and Σx²=Σy² and
    r = (M·Σxy − Σx²) / (M·Σx² − Σx²) — no sqrt). All sums are exact
    BIGINTs on both engines; the final combination runs in DOUBLE with the
    identical expression order, so the rounded value is bit-stable."""
    return f"""{_graph_ctes(graph)},
und AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
sym AS MATERIALIZED (
    SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
),
deg AS MATERIALIZED (
    SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY a
),
pairs AS MATERIALIZED (
    SELECT da.d AS dx, db.d AS dy
    FROM sym s JOIN deg da ON da.id = s.a JOIN deg db ON db.id = s.b
),
sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS m,
           CAST(SUM(dx) AS BIGINT) AS sx,
           CAST(SUM(dx * dy) AS BIGINT) AS sxy,
           CAST(SUM(dx * dx) AS BIGINT) AS sxx
    FROM pairs
)
SELECT m AS m_endpoints,
       ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / NULLIF(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0),
             6) AS assortativity
FROM sums"""


def graph_summary_sql(graph: str) -> str:
    """describe() for a graph: one row of exact global statistics (the avg
    is the only double; round 6, integer inputs — bit-stable)."""
    return f"""{_graph_ctes(graph)},
und AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
deg AS MATERIALIZED (
    SELECT id, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und
    ) GROUP BY id
)
SELECT (SELECT COUNT(*) FROM vertices) AS n_vertices,
       (SELECT COUNT(*) FROM edges) AS n_edges_directed,
       (SELECT COUNT(*) FROM und) AS n_edges_undirected,
       (SELECT MIN(d) FROM deg) AS min_degree,
       (SELECT MAX(d) FROM deg) AS max_degree,
       ROUND(CAST((SELECT SUM(d) FROM deg) AS DOUBLE)
             / NULLIF(CAST((SELECT COUNT(*) FROM deg) AS DOUBLE), 0.0),
             6) AS avg_degree"""


def degree_histogram_sql(graph: str) -> str:
    """(bucket, n_vertices): vertices per power-of-two undirected-degree
    bucket (bucket = floor(log2(d)) as the power's lower bound)."""
    return f"""{_graph_ctes(graph)},
und AS MATERIALIZED (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
deg AS MATERIALIZED (
    SELECT id, COUNT(*) AS d FROM (
        SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und
    ) GROUP BY id
)
SELECT CAST(POWER(2, FLOOR(LOG2(d))) AS BIGINT) AS bucket,
       COUNT(*) AS n_vertices
FROM deg GROUP BY 1"""


def degrees_sql(graph: str) -> str:
    return f"""{_graph_ctes(graph)}
SELECT v.id,
       COALESCE(o.c, CAST(0 AS BIGINT)) AS out_degree,
       COALESCE(i.c, CAST(0 AS BIGINT)) AS in_degree
FROM vertices v
LEFT JOIN (SELECT src AS id, COUNT(*) AS c FROM edges GROUP BY src) o ON o.id = v.id
LEFT JOIN (SELECT dst AS id, COUNT(*) AS c FROM edges GROUP BY dst) i ON i.id = v.id"""


def scc_sql(graph: str, k: int) -> str:
    """SCC labels via K-bounded mutual reachability (exact when K ≥ the
    longest shortest path within any SCC). Only used on small derived graphs
    — the engine's coloring algorithm is the scale path."""
    steps = ["r0 AS MATERIALIZED (SELECT id AS src, id AS dst FROM vertices)"]
    for i in range(1, k + 1):
        p = f"r{i - 1}"
        steps.append(f"""r{i} AS MATERIALIZED (
    SELECT r.src, e.dst FROM {p} r JOIN edges e ON e.src = r.dst
    UNION
    SELECT src, dst FROM {p}
)""")
    return (
        f"{_graph_ctes(graph)},\n"
        + ",\n".join(steps)
        + f"""
SELECT a.src AS id, MIN(a.dst) AS scc
FROM r{k} a JOIN r{k} b ON a.src = b.dst AND a.dst = b.src
GROUP BY a.src"""
    )


def collect_neighbors_sql(graph: str) -> str:
    """Out-neighbor adjacency as a sorted comma-joined string (portable
    across the engines' array representations)."""
    return f"""{_graph_ctes(graph)}
SELECT src AS id,
       string_agg(CAST(dst AS VARCHAR), ',' ORDER BY dst) AS neighbors
FROM (SELECT DISTINCT src, dst FROM edges) e
GROUP BY src"""


def weighted_indegree_sql(graph: str) -> str:
    return f"""{_graph_ctes(graph)}
SELECT dst AS id, CAST(SUM(weight) AS DOUBLE) AS w_indegree
FROM edges GROUP BY dst"""


def mst_sql(graph: str, phases: int, k_inner: int) -> str:
    """Unrolled Borůvka twin of ``algorithms.mst.minimum_spanning_forest``.

    Per phase: label edges with current component ids, pick each component's
    minimum cross-edge by the strict order (w, a, b), union into the forest,
    then ``k_inner`` min-label propagation steps over the picked
    component-graph edges. Both the forest and the labels are monotone, so a
    converged engine run equals the unrolled SQL for any ``phases`` /
    ``k_inner`` at or beyond convergence (same argument as cc_sql).
    """
    steps = [
        """canon AS MATERIALIZED (
    SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, MIN(weight) AS w
    FROM edges WHERE src <> dst GROUP BY LEAST(src, dst), GREATEST(src, dst)
)""",
        "comp0 AS MATERIALIZED (SELECT id, id AS comp FROM vertices)",
        "mst0 AS MATERIALIZED (SELECT a, b, w FROM canon WHERE 1 = 0)",
    ]
    for p in range(1, phases + 1):
        q = p - 1
        steps.append(f"""lab{p} AS MATERIALIZED (
    SELECT c.a, c.b, c.w, ca.comp AS ca, cb.comp AS cb
    FROM canon c
    JOIN comp{q} ca ON ca.id = c.a
    JOIN comp{q} cb ON cb.id = c.b
    WHERE ca.comp <> cb.comp
)""")
        steps.append(f"""sel{p} AS MATERIALIZED (
    SELECT DISTINCT w, a, b, ca, cb FROM (
        SELECT comp, w, a, b, ca, cb,
               ROW_NUMBER() OVER (PARTITION BY comp ORDER BY w, a, b) AS rn
        FROM (
            SELECT ca AS comp, w, a, b, ca, cb FROM lab{p}
            UNION ALL
            SELECT cb AS comp, w, a, b, ca, cb FROM lab{p}
        ) i
    ) r WHERE rn = 1
)""")
        steps.append(
            f"mst{p} AS MATERIALIZED (SELECT a, b, w FROM mst{q} "
            f"UNION SELECT a, b, w FROM sel{p})"
        )
        steps.append(
            f"g{p} AS MATERIALIZED (SELECT ca AS u, cb AS v FROM sel{p} "
            f"UNION SELECT cb AS u, ca AS v FROM sel{p})"
        )
        steps.append(
            f"l{p}_0 AS MATERIALIZED (SELECT comp AS u, comp AS lbl "
            f"FROM (SELECT DISTINCT comp FROM comp{q}) t)"
        )
        for i in range(1, k_inner + 1):
            steps.append(f"""l{p}_{i} AS MATERIALIZED (
    SELECT l.u,
           CASE WHEN m.ml IS NOT NULL AND m.ml < l.lbl THEN m.ml
                ELSE l.lbl END AS lbl
    FROM l{p}_{i - 1} l
    LEFT JOIN (
        SELECT g.v AS u, MIN(l2.lbl) AS ml
        FROM g{p} g JOIN l{p}_{i - 1} l2 ON l2.u = g.u
        GROUP BY g.v
    ) m ON m.u = l.u
)""")
        steps.append(
            f"comp{p} AS MATERIALIZED (SELECT c.id, l.lbl AS comp "
            f"FROM comp{q} c JOIN l{p}_{k_inner} l ON l.u = c.comp)"
        )
    return (
        f"{_graph_ctes(graph)},\n"
        + ",\n".join(steps)
        + f"\nSELECT a AS src, b AS dst, w AS weight FROM mst{phases}"
    )


def matmul_sql(graph: str) -> str:
    """C = A·A over the graph's weighted adjacency matrix in COO form."""
    return f"""{_graph_ctes(graph)}
SELECT x.src AS i, y.dst AS j, CAST(SUM(x.weight * y.weight) AS DOUBLE) AS v
FROM edges x JOIN edges y ON x.dst = y.src
GROUP BY x.src, y.dst"""


def bfs_census_sql(graph: str, source: int | str, k: int,
                   *, undirected: bool = False) -> str:
    """Per-superstep active-vertex census for frontier BFS (O20 metrics
    twin). After superstep s, the active set is exactly the vertices first
    reached at level s (unit weights: BFS levels are final), so the census
    sequence is |level 1|, |level 2|, …, |level D|, 0 — the trailing zero is
    the convergence superstep the engine records before stopping."""
    bfs = bfs_sql(graph, source, k, undirected=undirected)
    return f"""
WITH counts AS (
    SELECT CAST(level AS BIGINT) AS lvl, COUNT(*) AS c
    FROM ({bfs}) b
    WHERE level IS NOT NULL AND level > 0
    GROUP BY 1
),
mx AS (SELECT COALESCE(MAX(lvl), 0) AS m FROM counts),
steps AS (
    SELECT unnest(generate_series(1, (SELECT CAST(m + 1 AS INTEGER) FROM mx)))
        AS superstep
)
SELECT CAST(s.superstep AS INTEGER) AS superstep,
       CAST(COALESCE(c.c, 0) AS BIGINT) AS n_active
FROM steps s LEFT JOIN counts c ON c.lvl = s.superstep
"""


def ppr_sql(graph: str, source: int, k: int, *, damping: float = 0.5,
            round_to: int = 6) -> str:
    """Fixed-k personalized PageRank: teleport mass returns to ``source``
    only; vertices with no in-flow decay toward 0 (no keep-prior rule —
    mirrors _PersonalizedPageRankProgram.update's COALESCE(agg, 0))."""
    steps = [
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS MATERIALIZED (SELECT id, CASE WHEN id = {source} THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS pr FROM vertices)",
    ]
    for i in range(1, k + 1):
        p = f"r{i - 1}"
        steps.append(f"""r{i} AS MATERIALIZED (
    SELECT v.id,
           {damping} * COALESCE(m.s, 0.0)
           + CASE WHEN v.id = {source} THEN {1.0 - damping} ELSE 0.0 END AS pr
    FROM {p} v
    LEFT JOIN (
        SELECT e.dst AS id, SUM(p.pr / g.outdeg) AS s
        FROM {p} p
        JOIN edges e ON e.src = p.id
        JOIN deg g ON g.id = p.id
        GROUP BY e.dst
    ) m ON m.id = v.id
)""")
    return (
        f"{_graph_ctes(graph)},\n"
        + ",\n".join(steps)
        + f"\nSELECT id, ROUND(pr, {round_to}) AS pr FROM r{k}"
    )
