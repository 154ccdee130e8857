"""Local replica of the driver's Spark-vs-DuckDB comparison: row count,
column names, and order-insensitive value comparison (sorted by all columns,
NaN/None normalized)."""

from __future__ import annotations

import math


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return float(v)
        return v
    return v


def compare(spark_df, duck_con, sql: str, *, float_tol: float = 0.0) -> None:
    """float_tol defaults to 0.0 — the real driver hashes values EXACTLY, so
    the local gate must be at least as strict."""
    spark_rows = [tuple(_norm(v) for v in r) for r in spark_df.collect()]
    duck_rel = duck_con.execute(sql)
    duck_cols = [d[0] for d in duck_rel.description]
    duck_rows = [tuple(_norm(v) for v in r) for r in duck_rel.fetchall()]

    spark_cols = list(spark_df.columns)
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={spark_cols} duck={duck_cols}"
    )
    # align duck column order to spark's
    idx = [duck_cols.index(c) for c in spark_cols]
    duck_rows = [tuple(r[i] for i in idx) for r in duck_rows]

    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    def key(row):
        return tuple((v is None, str(type(v).__name__), str(v)) for v in row)

    spark_sorted = sorted(spark_rows, key=key)
    duck_sorted = sorted(duck_rows, key=key)
    mismatches = []
    for srow, drow in zip(spark_sorted, duck_sorted):
        for sv, dv in zip(srow, drow):
            if sv is None and dv is None:
                continue
            if isinstance(sv, float) and isinstance(dv, float):
                if abs(sv - dv) > float_tol:
                    mismatches.append((srow, drow))
                    break
            elif sv != dv:
                mismatches.append((srow, drow))
                break
    assert not mismatches, f"{len(mismatches)} row mismatches; first 5: {mismatches[:5]}"
