"""Deterministic corpus sampling (SURVEY §2.2 (†) — training-data pipeline
surface; absent from the reference, which has no sampling operator).

The core primitive is a content-keyed uniform bucket: the first two hex
digits of ``md5(text)`` are a uniform value in ['00'..'ff'] computed
identically by every engine — so a sample is reproducible across engines,
re-runs, and cluster sizes, and is a pure narrow filter (no shuffle, no RNG
state, no seed plumbing). This is how production pipelines sample at 100 TB:
``spark.sample()``'s per-partition RNG changes membership when partitioning
changes; a content hash never does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gmr_spark.sources.tables import load_tables

# per-stratum keep thresholds on the md5-prefix bucket (hex string compare):
# dominant language downsampled to 16/256, the rest kept at 128/256 — the
# standard "rebalance the language mix" move for multilingual corpora.
STRATA_THRESHOLDS = {"en": "10"}
DEFAULT_THRESHOLD = "80"


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source): deterministic stratified sample of the
    documents table — per-language rates via content-hash bucketing."""
    docs = load_tables(spark, sf_dir)["documents"]
    bucket = F.substring(F.md5(F.col("text")), 1, 2)
    thresh = F.lit(DEFAULT_THRESHOLD)
    for lang, t in STRATA_THRESHOLDS.items():
        thresh = F.when(F.col("lang") == lang, t).otherwise(thresh)
    return docs.filter(bucket < thresh).select("doc_id", "lang", "source")
