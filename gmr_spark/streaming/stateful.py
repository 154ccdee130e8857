"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the engine's arbitrary-stateful path (the streaming analog of
the reference's per-vertex mutable state, partition.h:39-41): per-user
running event counts that survive across micro-batches. State schema is a
single LONG; output is emitted per batch with the updated running total.

The grouped function is a nested closure (pickled by value — Spark python
workers can't import this package, see operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from gmr_spark.streaming.windowed import read_events_stream

OUTPUT_SCHEMA = "user_id bigint, n_events bigint"
STATE_SCHEMA = "cnt bigint"


def _make_count_fn():
    def update_counts(key, pdfs, state):
        import pandas as pd

        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    return update_counts


def start_user_running_counts(spark: SparkSession, sf_dir: str,
                              query_name: str = "user_running_counts") -> StreamingQuery:
    """File-source stream → per-user stateful running count → memory sink."""
    raw = read_events_stream(spark, sf_dir)
    counted: DataFrame = raw.groupBy("user_id").applyInPandasWithState(
        _make_count_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    return (
        counted.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
