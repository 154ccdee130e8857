"""Parquet loaders for the driver's synthetic tables (TESTDATA.md).

The driver's parquet stores timestamps as INT64 TIMESTAMP(NANOS). Spark's
handling of that physical type has changed across 4.x: 4.0 rejects it
outright unless ``spark.sql.legacy.parquet.nanosAsLong`` is set (then it
reads as LONG nanos), while 4.1+ reads it natively as TIMESTAMP_NTZ
(micros truncation — lossless here, the data carries no sub-microsecond
components; asserted in tests rather than verified at load, which would
cost a scan). ``_load_one`` normalizes BOTH representations to the
session-TZ TimestampType the rest of the engine (and the r1/r2-green
driver parity baseline) was built against: LONG → ``timestamp_micros(ns
div 1000)``; NTZ → plain cast (session TZ is pinned to UTC in
``get_session``, so the instant is unchanged). DuckDB reads the same files
as TIMESTAMP_NS natively, so both engines see identical instants.
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
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):  # Spark 4.0 + nanosAsLong
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
        elif isinstance(dt, T.TimestampNTZType):  # Spark 4.1+ native read
            # wall-clock -> instant via epoch arithmetic, NOT cast: a plain
            # NTZ->TIMESTAMP cast interprets the wall time in the SESSION
            # time zone, so on a non-UTC driver session every instant (and
            # every epoch the queries emit) would shift by the UTC offset
            # while DuckDB reads the same file as naive TIMESTAMP_NS.
            # timestampdiff from the NTZ epoch is session-TZ-independent
            # and lands on exactly the instants the (r1/r2-green)
            # timestamp_micros path produced.
            df = df.withColumn(c, F.timestamp_micros(F.expr(
                f"timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})")))
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
