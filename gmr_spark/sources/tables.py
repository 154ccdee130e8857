"""Parquet loaders for the driver's synthetic tables (TESTDATA.md).

The driver's parquet stores timestamps as INT64 TIMESTAMP(NANOS), which
Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL). We read nanos as LONG
(``spark.sql.legacy.parquet.nanosAsLong``, runtime-settable) and rebuild a
proper TimestampType via integer division to microseconds — lossless here
(the data carries no sub-microsecond components; verified at load would cost
a scan, so it is asserted in tests instead). DuckDB reads the same files as
TIMESTAMP_NS natively, so both engines see identical instants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns written as TIMESTAMP(NANOS) in the driver's parquet
_NANO_TS_COLUMNS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def _load_one(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLUMNS.get(name, ()):
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return {t: _load_one(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (same names DuckDB pre-registers),
    so shared SQL strings run verbatim on both engines."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
