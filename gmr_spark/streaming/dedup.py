"""Streaming deduplication — dropDuplicatesWithinWatermark.

The streaming member of the dedup family (operators/dedup.py): emit each
(user_id, event_type) key once per watermark window, with state expiring as
the watermark advances — the standard bounded-state dedup for infinite
streams (an unbounded ``dropDuplicates`` would grow state forever at 100 TB
ingest). Batch twin: ``SELECT DISTINCT user_id, event_type`` — the test
asserts the emitted key set equals the batch distinct.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from gmr_spark.streaming.windowed import read_events_stream


def start_events_dedup_stream(spark: SparkSession, sf_dir: str,
                              query_name: str = "events_dedup_stream") -> StreamingQuery:
    """File-source stream → watermarked dedup on (user_id, event_type) →
    memory sink holding one row per emitted key."""
    events = read_events_stream(spark, sf_dir)
    deduped = (
        events.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
