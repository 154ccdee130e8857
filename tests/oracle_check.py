"""Local replica of the driver's Spark-vs-DuckDB comparison: row count,
column names, and order-insensitive value comparison (sorted by all columns,
NaN/None normalized).

The DuckDB side is fetched through ``.df()`` (pandas), NOT ``fetchall()``,
because the driver hashes a pandas frame: DuckDB HUGEINT (e.g. SUM over
INTEGER) widens to float64 in pandas while ``fetchall()`` would hand back a
plain Python int that accidentally compares equal to Spark's bigint. Round 2
shipped exactly that bug (q12 green locally, hash-fail on the driver), so
the local gate now also treats an int-vs-float type-class difference as a
mismatch even when the values are numerically equal.
"""

from __future__ import annotations

import datetime
import math


def _norm(v):
    # numpy scalar -> Python scalar (keeps the float-ness of HUGEINT->float64)
    item = getattr(v, "item", None)
    if item is not None and type(v).__module__ == "numpy":
        v = item()
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            # NULL in a DuckDB float column surfaces as NaN through .df();
            # the driver's canonicalizer equates it with Spark's None (the
            # graph_file_bfs unreachable-vertex row was driver-green), so
            # the local gate does too.
            return None
        return v
    # pandas Timestamp / NaT
    if type(v).__name__ == "Timestamp":
        return v.to_pydatetime()
    if type(v).__name__ == "NaTType":
        return None
    return v


def _type_class(v):
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, datetime.datetime):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    return type(v).__name__


def compare(spark_df, duck_con, sql: str, *, float_tol: float = 0.0) -> None:
    """float_tol defaults to 0.0 — the real driver hashes values EXACTLY, so
    the local gate must be at least as strict."""
    spark_rows = [tuple(_norm(v) for v in r) for r in spark_df.collect()]
    duck_rel = duck_con.execute(sql)
    duck_pdf = duck_rel.df()
    duck_cols = list(duck_pdf.columns)
    duck_rows = [
        tuple(_norm(v) for v in row)
        for row in duck_pdf.itertuples(index=False, name=None)
    ]

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

    # Driver-faithful strictness: a bigint column on one side vs a float64
    # column on the other hashes differently even when values match.
    for col_i, cname in enumerate(spark_cols):
        s_classes = {_type_class(r[col_i]) for r in spark_rows} - {"null"}
        d_classes = {_type_class(r[col_i]) for r in duck_rows} - {"null"}
        assert s_classes == d_classes, (
            f"type-class mismatch on column {cname!r}: "
            f"spark={sorted(s_classes)} duck={sorted(d_classes)} "
            "(DuckDB HUGEINT->pandas float64? add CAST(... AS BIGINT)/DOUBLE "
            "to the oracle)"
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
