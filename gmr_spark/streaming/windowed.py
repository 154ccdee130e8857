"""Structured Streaming surface over the events table.

The reference is batch-iterative only (SURVEY §2.2: no watermarks, windows,
or streaming state anywhere in /root/reference); this module adds the
streaming capabilities a modern engine owes its users, with the batch twin
(`events_hourly` in the declared query set) oracle-checked — the streaming
path is asserted equal to the batch path in tests, which is exactly the
Dataset-duality guarantee Structured Streaming makes.

The events parquet stores ts as TIMESTAMP(NANOS); streaming reads use an
explicit LONG schema + timestamp_micros conversion (same trick as the batch
loader, gmr_spark/sources/tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming import StreamingQuery

EVENTS_STREAM_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),  # nanos-as-long (see module docstring)
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _windowed_agg(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("hour_epoch"),
            "event_type", "n", "total_value",
        )
    )


def events_hourly_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming hourly rollup (declared, oracle-checked):
    (hour_epoch BIGINT, event_type, n BIGINT, total_value DOUBLE)."""
    from gmr_spark.sources.tables import load_tables

    return _windowed_agg(load_tables(spark, sf_dir)["events"])


def start_events_hourly_stream(spark: SparkSession, sf_dir: str,
                               query_name: str = "events_hourly_stream") -> StreamingQuery:
    """File-source streaming version of the same rollup: watermarked event
    time, complete-mode memory sink (for test/demo; production sinks swap in
    via writeStream options). One micro-batch drains the parquet file."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file source requires a directory; glob-filter to the events file
    raw = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    agg = _windowed_agg(events.withWatermark("ts", "1 hour"))
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
