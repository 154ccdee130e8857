"""Streaming/batch duality: the streaming hourly rollup must equal the batch
twin (which is itself oracle-checked against DuckDB)."""

from __future__ import annotations

from gmr_spark.streaming.windowed import events_hourly_batch, start_events_hourly_stream

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark):
    q = start_events_hourly_stream(spark, SF, query_name="t_events_hourly")
    try:
        q.processAllAvailable()
        got = {
            (r.hour_epoch, r.event_type): (r.n, r.total_value)
            for r in spark.sql("SELECT * FROM t_events_hourly").collect()
        }
    finally:
        q.stop()
    want = {
        (r.hour_epoch, r.event_type): (r.n, r.total_value)
        for r in events_hourly_batch(spark, SF).collect()
    }
    assert got == want
    assert len(want) > 0
