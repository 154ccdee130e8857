"""Unrolled DuckDB twin of algorithms.svdpp — identical arithmetic, one CTE
pair per batch-GD iteration. Every float literal is CAST AS DOUBLE (DuckDB
parses bare 0.01 as DECIMAL, whose exact arithmetic would diverge from the
Spark side's IEEE doubles); expression shapes (association order, division
vs reciprocal) mirror the Spark code term for term so the only cross-engine
difference is aggregation fold order, absorbed by the final ROUND(., 6).
"""

from __future__ import annotations

from gmr_spark.algorithms.svdpp import (
    SVDPP_GAMMA,
    SVDPP_ITERS,
    SVDPP_LAMBDA,
    SVDPP_RANK,
)


def _dbl(x: float) -> str:
    return f"CAST({x!r} AS DOUBLE)"


def svdpp_sql(*, rank: int = SVDPP_RANK, iters: int = SVDPP_ITERS,
              gamma: float = SVDPP_GAMMA, lam: float = SVDPP_LAMBDA) -> str:
    dims = range(rank)
    g, l = _dbl(gamma), _dbl(lam)

    def init(idc: str, mult: int, dmult: int, d: int) -> str:
        return (f"CAST(({idc} * {mult} + {d * dmult}) % 97 - 48 AS DOUBLE)"
                f" / {_dbl(970.0)}")

    def dot(p: str, q: str, imp: str) -> str:
        return " + ".join(
            f"{q}.q{d} * ({p}.p{d} + {imp}.imp{d})" for d in dims)

    parts = [f"""
WITH edges AS MATERIALIZED (
    SELECT u, i, CAST((u * 7 + i * 13) % 5 + 1 AS DOUBLE) AS r
    FROM (
        SELECT DISTINCT o.o_custkey AS u, li.l_partkey AS i
        FROM orders o JOIN lineitem li ON li.l_orderkey = o.o_orderkey
    )
),
mu AS MATERIALIZED (SELECT SUM(r) / COUNT(*) AS mu FROM edges),
u0 AS MATERIALIZED (
    SELECT u, COUNT(*) AS nu, CAST(0 AS DOUBLE) AS bu,
           {", ".join(f"{init('u', 31, 17, d)} AS p{d}" for d in dims)}
    FROM edges GROUP BY u
),
i0 AS MATERIALIZED (
    SELECT i, CAST(0 AS DOUBLE) AS bi,
           {", ".join(f"{init('i', 37, 19, d)} AS q{d}" for d in dims)},
           {", ".join(f"{init('i', 41, 23, d)} AS y{d}" for d in dims)}
    FROM (SELECT DISTINCT i FROM edges)
)"""]

    for t in range(1, iters + 1):
        p, c = t - 1, t  # previous / current state suffix
        parts.append(f""",
imp{c} AS MATERIALIZED (
    SELECT e.u,
           {", ".join(f"SUM(it.y{d}) / sqrt(u.nu) AS imp{d}" for d in dims)}
    FROM edges e JOIN i{p} it ON it.i = e.i JOIN u{p} u ON u.u = e.u
    GROUP BY e.u, u.nu
),
err{c} AS MATERIALIZED (
    SELECT e.u, e.i,
           e.r - (mu.mu + us.bu + it.bi + ({dot('us', 'it', 'im')})) AS err,
           {", ".join(f"it.q{d} AS q{d}" for d in dims)},
           {", ".join(f"us.p{d} + im.imp{d} AS pimp{d}" for d in dims)}
    FROM edges e
    JOIN u{p} us ON us.u = e.u
    JOIN i{p} it ON it.i = e.i
    JOIN imp{c} im ON im.u = e.u
    CROSS JOIN mu
),
u{c} AS MATERIALIZED (
    SELECT us.u, us.nu,
           us.bu + {g} * (a.se - {l} * us.bu) AS bu,
           {", ".join(f"us.p{d} + {g} * (a.sp{d} - {l} * us.p{d}) AS p{d}"
                      for d in dims)}
    FROM u{p} us JOIN (
        SELECT u, SUM(err) AS se,
               {", ".join(f"SUM(err * q{d}) AS sp{d}" for d in dims)}
        FROM err{c} GROUP BY u
    ) a ON a.u = us.u
),
yg{c} AS MATERIALIZED (
    SELECT a.u, {", ".join(f"a.sp{d} / sqrt(us.nu) AS g{d}" for d in dims)}
    FROM (
        SELECT u, {", ".join(f"SUM(err * q{d}) AS sp{d}" for d in dims)}
        FROM err{c} GROUP BY u
    ) a JOIN u{p} us ON us.u = a.u
),
i{c} AS MATERIALIZED (
    SELECT it.i,
           it.bi + {g} * (a.se - {l} * it.bi) AS bi,
           {", ".join(f"it.q{d} + {g} * (a.sq{d} - {l} * it.q{d}) AS q{d}"
                      for d in dims)},
           {", ".join(f"it.y{d} + {g} * (y.t{d} - {l} * it.y{d}) AS y{d}"
                      for d in dims)}
    FROM i{p} it
    JOIN (
        SELECT i, SUM(err) AS se,
               {", ".join(f"SUM(err * pimp{d}) AS sq{d}" for d in dims)}
        FROM err{c} GROUP BY i
    ) a ON a.i = it.i
    JOIN (
        SELECT e.i, {", ".join(f"SUM(yg.g{d}) AS t{d}" for d in dims)}
        FROM edges e JOIN yg{c} yg ON yg.u = e.u GROUP BY e.i
    ) y ON y.i = it.i
)""")

    k = iters
    parts.append(f""",
impF AS MATERIALIZED (
    SELECT e.u,
           {", ".join(f"SUM(it.y{d}) / sqrt(u.nu) AS imp{d}" for d in dims)}
    FROM edges e JOIN i{k} it ON it.i = e.i JOIN u{k} u ON u.u = e.u
    GROUP BY e.u, u.nu
)
SELECT e.u, e.i, e.r AS rating,
       ROUND(mu.mu + us.bu + it.bi + ({dot('us', 'it', 'im')}), 6) AS pred
FROM edges e
JOIN u{k} us ON us.u = e.u
JOIN i{k} it ON it.i = e.i
JOIN impF im ON im.u = e.u
CROSS JOIN mu
""")
    return "".join(parts)
