#!/usr/bin/env python
"""Structured Streaming throughput at scale-class volume (local[32]).

The streaming surface is duality-tested at sf0.1 (stream result == batch
twin, tests/test_streaming.py); this probe adds the missing SCALE evidence:
sustained micro-batch throughput on a 50M-event corpus for

1. the watermarked hourly tumbling aggregation
   (streaming/windowed._windowed_agg) — the windowed state-store path, and
2. the stream-stream attribution join (streaming/joins._attribution_pairs,
   two-sided watermarks + time-range condition) — the state-heavy path
   whose eviction contract is what keeps 100 TB/day ingest bounded.

Method: synthesize events matching EVENTS_STREAM_SCHEMA, range-partitioned
by ts into 64 parquet files (so the file source's batch order roughly
follows event time and the watermark advances monotonically), stream with
maxFilesPerTrigger=8 (8 micro-batches), noop sink (no driver-side
collection), wall-clock the drain via processAllAvailable(). Throughput =
input rows / drain wall; per-batch numbers come from the query's own
progress metrics.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("STREAM_EVENTS", 50_000_000))
SCRATCH = os.environ.get("STREAM_SCRATCH", "/tmp/stream_scale")
CPUS = os.environ.get("STREAM_CPUS", "32")


def build_events(spark, n: int, scratch: str) -> str:
    from pyspark.sql import functions as F

    if os.path.exists(scratch):
        shutil.rmtree(scratch)
    os.makedirs(scratch)
    # 7 days of events; ids spread uniformly over time so each of the 64
    # range files is a ~2.6h slice and the watermark advances per batch
    span_s = 7 * 86400
    ts = F.expr(
        f"timestampadd(SECOND, CAST(id % {span_s} AS INT), "
        "TIMESTAMP_NTZ '2024-01-01 00:00:00')")
    etype = F.element_at(
        F.array(F.lit("view"), F.lit("view"), F.lit("view"),
                F.lit("click"), F.lit("purchase")),
        (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int"))
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        ts.alias("ts"),
        F.pmod(F.col("id"), F.lit(200_000)).alias("user_id"),
        etype.alias("event_type"),
        (F.pmod(F.col("id"), F.lit(1000)) / 10.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.repartitionByRange(64, "ts").write.parquet(f"{scratch}/events.parquet")
    return scratch


def drain(q) -> tuple[float, int, int]:
    """-> (wall_s, total_input_rows, n_batches). processAllAvailable blocks
    until the file source is exhausted."""
    t0 = time.perf_counter()
    q.processAllAvailable()
    wall = time.perf_counter() - t0
    rows = sum(int(p["numInputRows"]) for p in q.recentProgress)
    batches = sum(1 for p in q.recentProgress if int(p["numInputRows"]) > 0)
    q.stop()
    return round(wall, 1), rows, batches


def main() -> None:
    from gmr_spark.session import calibration_probe, get_session
    from gmr_spark.streaming.joins import ATTRIB_WINDOW, _attribution_pairs, _split
    from gmr_spark.streaming.windowed import _windowed_agg, read_events_stream

    spark = get_session("stream_scale", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    calibration_probe(spark)
    cal = calibration_probe(spark)

    t0 = time.perf_counter()
    sf = build_events(spark, N, SCRATCH)
    build_s = round(time.perf_counter() - t0, 1)
    out = {"events": N, "cpus": int(CPUS), "build_s": build_s}

    def stream_opts(df_stream):
        return (df_stream.writeStream.format("noop")
                .option("checkpointLocation",
                        f"{SCRATCH}/ckpt_{int(time.time()*1000)}"))

    # the corpus is a DIRECTORY of 64 part files (unlike the single-file
    # testdata layout), so point the source at it and let every part match;
    # maxFilesPerTrigger=8 splits the drain into 8 micro-batches
    src = f"{sf}/events.parquet"
    opts = {"pathGlobFilter": "*.parquet", "maxFilesPerTrigger": "8"}

    # probe 1: watermarked hourly tumbling agg, update mode (append would
    # hold every window until the watermark passes; update emits deltas —
    # either way the noop sink discards them, state size is what matters)
    events = (read_events_stream(spark, src, options=opts)
              .withWatermark("ts", "1 hour"))
    q = (stream_opts(_windowed_agg(events))
         .outputMode("update")
         .start())
    wall, rows, batches = drain(q)
    out["windowed_agg"] = {
        "wall_s": wall, "rows": rows, "batches": batches,
        "rows_per_sec": round(rows / wall) if wall else None,
    }

    # probe 2: stream-stream attribution join (two-sided watermark + range);
    # numInputRows counts BOTH sides, so rows ~= 2 * events here
    p, _ = _split(read_events_stream(spark, src, options=opts))
    _, v = _split(read_events_stream(spark, src, options=opts))
    joined = _attribution_pairs(
        p.withWatermark("p_ts", ATTRIB_WINDOW),
        v.withWatermark("v_ts", ATTRIB_WINDOW),
    )
    q = stream_opts(joined).outputMode("append").start()
    wall, rows, batches = drain(q)
    out["stream_stream_join"] = {
        "wall_s": wall, "rows": rows, "batches": batches,
        "rows_per_sec": round(rows / wall) if wall else None,
    }

    out["calibration_sec"] = cal
    out["calibration_post_sec"] = calibration_probe(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
