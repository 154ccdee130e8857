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
                          *, n_salt: int = 16, out_col: str = "n_distinct") -> DataFrame:
    key_col = F.col(key) if isinstance(key, str) else key
    value_col = F.col(value) if isinstance(value, str) else value
    salted = df.select(
        key_col.alias("_k"),
        value_col.alias("_v"),
        F.pmod(F.hash(value_col), F.lit(n_salt)).alias("_salt"),
    )
    partial = salted.groupBy("_k", "_salt", "_v").agg(F.lit(1).alias("_one"))
    return (
        partial.groupBy("_k")
        .agg(F.count(F.lit(1)).alias(out_col))
        .withColumnRenamed("_k", key if isinstance(key, str) else "key")
    )
