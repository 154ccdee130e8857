"""Skew-handling primitives (SURVEY §4 'needs custom work' item 2).

AQE's skew-join splitting covers joins; holistic aggregations over a hot key
(collect_set, exact distinct) still need the salting template: spread each
hot group over ``n_salt`` deterministic sub-groups, partially aggregate per
(key, salt), then merge per key. The merge stage's fan-in per key is the
partially-reduced volume, not the raw row count.

``salted_count_distinct`` is the oracle-checkable instance of the template
(semantically identical to ``COUNT(DISTINCT v)``; Spark's native expand
strategy covers this specific aggregate too — the point here is the
declared, verified shape of the two-stage salted plan, reusable for the
aggregates Catalyst can't split).

The salt is ``pmod(hash(value), n_salt)``: deterministic (replayable tasks
at 100 TB must not use rand()), and dedup-safe because equal values land in
the same salt bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_count_distinct(df: DataFrame, key: str | Column, value: str | Column,
                          *, n_salt: int = 16, out_col: str = "n_distinct",
                          key_out: str | None = None) -> DataFrame:
    """Two-stage salted COUNT(DISTINCT value) per key.

    Stage 1 dedups per (key, salt, value) and counts distincts per
    (key, salt): that shuffle is keyed on (key, salt), so a hot key's rows
    spread over ``n_salt`` reducers instead of one. Stage 2 sums the
    per-salt counts per key — its fan-in is exactly ``n_salt`` rows per key,
    bounded no matter how hot the key is. The salt partitions the VALUE
    space (equal values share a salt), so per-salt distinct counts are
    disjoint and their sum is the exact global distinct count.

    ``key_out`` names the key column in the output; required when ``key`` is
    a Column expression (a plain string key reuses its own name).
    """
    if key_out is None:
        if not isinstance(key, str):
            raise ValueError("key_out is required when key is a Column")
        key_out = key
    key_col = F.col(key) if isinstance(key, str) else key
    value_col = F.col(value) if isinstance(value, str) else value
    salted = df.select(
        key_col.alias("_k"),
        value_col.alias("_v"),
        F.pmod(F.hash(value_col), F.lit(n_salt)).alias("_salt"),
    )
    # stage 1: distinct values per (key, salt) — shuffle key is (_k, _salt)
    per_salt = (
        salted.groupBy("_k", "_salt")
        .agg(F.count_distinct("_v").alias("_partial"))
    )
    # stage 2: merge — at most n_salt rows per key reach this aggregation
    return (
        per_salt.groupBy("_k")
        .agg(F.sum("_partial").alias(out_col))
        .withColumnRenamed("_k", key_out)
    )
