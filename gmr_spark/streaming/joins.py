"""Stream-stream joins over the events table.

The reference has no streaming at all (SURVEY §2.2); Structured Streaming's
stream-stream inner join with two-sided watermarks is the capability a
modern engine owes its users for event attribution — "which views preceded
this purchase?". Both sides are watermarked and the join condition carries
an explicit event-time range, so the state store can evict: a view row is
droppable once the watermark passes its ts + the attribution window, which
is exactly the bounded-state contract that makes this run forever at
production rates (an un-ranged stream-stream join would grow state without
bound).

Duality contract (same policy as streaming/windowed.py): the streaming join
must emit exactly the batch twin's pairs; the declared, oracle-checked query
is the batch aggregation ``attribution_batch`` and the raw-pair equality is
pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from gmr_spark.streaming.windowed import read_events_stream

ATTRIB_WINDOW = "1 hour"


def _split(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    return purchases, views


def _attribution_pairs(purchases: DataFrame, views: DataFrame) -> DataFrame:
    """(purchase_id, view_id): views by the same user within the hour before
    the purchase. Equi-key on user keeps it a hash join with a time-range
    residual — the state-evictable / scalable shape."""
    return purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") < F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW}")),
        "inner",
    ).select("purchase_id", "view_id", "p_user", "v_ts")


def attribution_pairs_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmr_spark.sources.tables import load_tables

    p, v = _split(load_tables(spark, sf_dir)["events"])
    return _attribution_pairs(p, v)


def attribution_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared batch twin: per purchase, how many views preceded it within
    the window and the EARLIEST such view by event time (view id as the
    deterministic tiebreak) — (purchase_id, user_id, n_views,
    first_view_id)."""
    pairs = attribution_pairs_batch(spark, sf_dir)
    return pairs.groupBy(
        F.col("purchase_id"), F.col("p_user").alias("user_id")
    ).agg(
        F.count(F.lit(1)).alias("n_views"),
        F.min_by("view_id", F.struct("v_ts", "view_id")).alias("first_view_id"),
    )


def start_attribution_stream(spark: SparkSession, sf_dir: str,
                             query_name: str = "attribution_stream") -> StreamingQuery:
    """Stream-stream inner join, both sides watermarked ``ATTRIB_WINDOW`` so
    view-side state is evicted once it can no longer match any future
    purchase. Append-mode memory sink for test/demo; production swaps the
    sink. Two readStream instances of the same source — each side tracks its
    own watermark, as Structured Streaming requires."""
    p, _ = _split(read_events_stream(spark, sf_dir))
    _, v = _split(read_events_stream(spark, sf_dir))
    joined = _attribution_pairs(
        p.withWatermark("p_ts", ATTRIB_WINDOW),
        v.withWatermark("v_ts", ATTRIB_WINDOW),
    )
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
