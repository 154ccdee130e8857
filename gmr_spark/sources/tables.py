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

import threading

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


# Loader-DataFrame memo keyed by (applicationId, sf_dir, dataset
# fingerprint). Constructing the 10 readers is pure driver-side work —
# spark.read.parquet resolves the source and reads the footer schema each
# time, ~0.9-1.2 s per load_tables call even warm (measured r14) — and the
# bench/correctness drivers call this once or more per query (~100+ calls a
# run, so tens of seconds of pure planning overhead). The memo returns the
# SAME lazy plans; every action still scans the parquet (no result caching),
# and a rewritten dataset mints a fresh sf_token, evicting the superseded
# generation (the derive._GRAPH_MEMO invalidation contract).
_TABLE_MEMO: dict[tuple, dict[str, DataFrame]] = {}
_TABLE_MEMO_LOCK = threading.Lock()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, sf_dir, sf_token(sf_dir))
    with _TABLE_MEMO_LOCK:
        hit = _TABLE_MEMO.get(key)
        if hit is not None:
            return dict(hit)  # shallow copy: callers may mutate the dict
    dfs = {t: _load_one(spark, sf_dir, t) for t in TABLES}
    with _TABLE_MEMO_LOCK:
        # evict superseded generations of this (app, sf_dir): their plans
        # point at rewritten files (lazy plans, no blocks — reference drop
        # only); keep-first on a lost race (plans are interchangeable)
        for k in [k for k in _TABLE_MEMO
                  if k[:2] == key[:2] and k != key]:
            _TABLE_MEMO.pop(k)
        dfs = _TABLE_MEMO.setdefault(key, dfs)
    return dict(dfs)


def sf_token(sf_dir: str) -> tuple:
    """Cheap content fingerprint of a dataset directory (name/mtime/size per
    parquet) — the shared cache-invalidation key for view registration here
    and the derived-graph memo (sources.derive)."""
    import os

    try:
        return tuple(sorted(
            (e.name, e.stat().st_mtime_ns, e.stat().st_size)
            for e in os.scandir(sf_dir) if e.name.endswith(".parquet")
        ))
    except OSError:
        return ()


# createOrReplaceTempView mutates the shared session catalog, and bench's
# _derive_all drives derive_graph (which registers views) from 3 threads
# (round-5 ADVICE): serialize registration and skip it when this
# application already has views over the same (sf_dir, fingerprint).
_REGISTER_LOCK = threading.Lock()
_LAST_REGISTERED: dict[str, tuple] = {}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (same names DuckDB pre-registers),
    so shared SQL strings run verbatim on both engines. Idempotent and
    thread-safe: concurrent/repeat calls for the same application + dataset
    fingerprint skip the catalog writes."""
    dfs = load_tables(spark, sf_dir)
    key = (sf_dir, sf_token(sf_dir))
    with _REGISTER_LOCK:
        app = spark.sparkContext.applicationId
        if _LAST_REGISTERED.get(app) != key:
            for name, df in dfs.items():
                df.createOrReplaceTempView(name)
            _LAST_REGISTERED[app] = key
    return dfs
