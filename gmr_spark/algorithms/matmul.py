"""Sparse matrix multiply over COO triples (reference: the declared-but-empty
``MatrixMultiply`` stub, algorithms.h:200).

A sparse matrix is a DataFrame (i, j, v); C = A·B is the classic join-on-inner-
dimension + groupBy-sum — exactly the SUMMA-style shuffle plan Catalyst
produces, with map-side partial aggregation. Zero custom code beyond the
expression; at 100 TB scale the inner-dimension join key should be
pre-partitioned (repartition(N, "j") / bucketing) which callers control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def matmul_coo(a: DataFrame, b: DataFrame) -> DataFrame:
    """(i,j,v) x (i,j,v) -> (i,j,v). Implicit zeros stay implicit."""
    aa = a.select(F.col("i").alias("ai"), F.col("j").alias("aj"), F.col("v").alias("av"))
    bb = b.select(F.col("i").alias("bi"), F.col("j").alias("bj"), F.col("v").alias("bv"))
    return (
        aa.join(bb, F.col("aj") == F.col("bi"))
        .groupBy(F.col("ai").alias("i"), F.col("bj").alias("j"))
        .agg(F.sum(F.col("av") * F.col("bv")).alias("v"))
    )
