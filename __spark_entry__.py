"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real implementation lives in the ``gmr_spark`` package; this module is a
thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: fixed-k PageRank on the geo hierarchy graph derived
    from the sf0.001 tables (SURVEY §2.1)."""
    from gmr_spark.queries import all_queries

    return all_queries()["pagerank_geo"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gmr_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from gmr_spark.queries import all_oracles

    return all_oracles()
