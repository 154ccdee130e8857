"""Generic format scan/sink surface (SURVEY §2.2 rows "Scans/sources" and
"Sinks").

The reference reads one text format and writes stdout only
(partition.h:183, algorithms.h:62-67); this module declares the engine's
general-purpose IO: parquet / orc / csv / json / xml (+ avro when its
module jar is deployed) readers and writers with optional hive-style
partition columns. Partitioned parquet is the 100 TB default — partition
pruning on the directory keys plus parquet row-group statistics give
scan-time filtering for free; orc is the equivalent columnar alternative
(stripe statistics, same pushdown story); csv/json/xml exist for
interchange (xml is built-in since Spark 4; avro ships as an external
module — `spark-avro_2.13`, absent in this container — so requesting it
raises Spark's own deploy-the-module AnalysisException, the documented
gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "orc", "csv", "json", "xml", "avro")
_XML_ROW_TAG = "row"


def write_table(df: DataFrame, path: str, *, fmt: str = "parquet",
                partition_by: list[str] | None = None,
                mode: str = "overwrite") -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    w = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        w = w.option("header", "true")
    if fmt == "xml":
        w = w.option("rowTag", _XML_ROW_TAG)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(spark: SparkSession, path: str, *, fmt: str = "parquet",
               schema: StructType | str | None = None) -> DataFrame:
    """Schema is required for csv/json/xml round-trip fidelity (all three
    are stringly-typed on disk; inference would widen/narrow types
    silently)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", "true")
    if fmt == "xml":
        r = r.option("rowTag", _XML_ROW_TAG)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)
