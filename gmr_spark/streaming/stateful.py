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


TWS_OUTPUT_SCHEMA = "user_id bigint, total_value double, n_events bigint"


def _make_totals_processor():
    """StatefulProcessor for transformWithStateInPandas — Spark 4's
    arbitrary-state API (typed ValueState via a handle, timers, TTL) that
    supersedes applyInPandasWithState. Defined as a nested class returned
    from a factory so it pickles by value (Spark python workers can't
    import this package)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class UserTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "total_value double, n_events bigint")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            total, n = (self._state.get() or (0.0, 0)) if self._state.exists() \
                else (0.0, 0)
            for pdf in rows:
                total += float(pdf["value"].sum())
                n += len(pdf)
            self._state.update((total, n))
            yield pd.DataFrame({
                "user_id": [key[0]],
                "total_value": [round(total, 6)],
                "n_events": [n],
            })

        def close(self) -> None:
            pass

    return UserTotalsProcessor()


def tws_available() -> bool:
    """transformWithStateInPandas needs a working google.protobuf (its
    state-server protocol is protobuf-based) AND the RocksDB state store.
    This container ships pyspark 4.1 with a broken/absent protobuf, so the
    operator is gated — the applyInPandasWithState twin above covers the
    capability; this one exercises the newer API where the environment
    allows."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def start_user_value_totals(spark: SparkSession, sf_dir: str,
                            query_name: str = "user_value_totals") -> StreamingQuery:
    """File-source stream → per-user (sum(value), count) via
    transformWithStateInPandas → memory sink. The modern twin of
    ``start_user_running_counts``; the duality test asserts it equals the
    batch groupBy. Requires ``tws_available()`` (see there) and the RocksDB
    state store provider:
    spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider
    """
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf, absent in "
            "this environment — use start_user_running_counts "
            "(applyInPandasWithState) instead")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    raw = read_events_stream(spark, sf_dir)
    totals: DataFrame = raw.groupBy("user_id").transformWithStateInPandas(
        _make_totals_processor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    return (
        totals.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
