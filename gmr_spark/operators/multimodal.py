"""Multimodal column plumbing (BASELINE.json north-star (†)).

Images/audio/video are opaque BINARY columns with typed metadata. The
container has no codec libraries, so the *decode* step is stubbed (clearly
marked), while everything Spark-side is real and tested: binary columns
through Arrow batches, mapInPandas batch shapes, schema contracts,
partition-preserving metadata extraction.

The synthetic corpus has no binary column, so ``documents.text`` is encoded
to UTF-8 bytes as the stand-in payload — byte-length and header-byte
metadata are real byte operations; width/height come from the deterministic
fake decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from gmr_spark.sources.tables import load_tables

DECODED_SCHEMA = "doc_id bigint, n_bytes int, header_byte int, width int, height int"


def decode_image(data: bytes) -> tuple[int, int]:
    """REAL decoder stub — no codec libs in this container.

    Raises until PIL/libvips lands; callers use fake_decode_batch in tests.
    """
    raise NotImplementedError("image codecs not available in this environment")


def _make_decode_batches():
    """Nested closure so cloudpickle ships it by value (workers can't import
    this package — see dedup.make_simhash32_udf)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def fake_dims(n_bytes: int) -> tuple[int, int]:
            # deterministic fake decode: dims from payload length only, so
            # the DuckDB twin reproduces them with pure arithmetic
            return (n_bytes * 7) % 640 + 1, (n_bytes * 13) % 480 + 1

        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.str.len().astype("int32")
            header = payload.map(lambda b: b[0] if len(b) else -1).astype("int32")
            dims = n_bytes.map(fake_dims)
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "header_byte": header,
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
            })

    return decode_batches


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bytes, header_byte, width, height): binary payloads through
    an Arrow mapInPandas 'decoder'. The partitioning of the input is
    preserved (mapInPandas is narrow) — at 100 TB the decode cost dominates
    and scales linearly with executors."""
    docs = load_tables(spark, sf_dir)["documents"]
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(_make_decode_batches(), schema=DECODED_SCHEMA)
