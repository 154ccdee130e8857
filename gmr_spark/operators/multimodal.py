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


RESIZED_SCHEMA = "doc_id bigint, in_width int, in_height int, out_width int, out_height int"


def _make_resize_batches(box: int = 256):
    """Aspect-preserving fit into a ``box``×``box`` target. The geometry is
    REAL (pure integer arithmetic, reproducible in SQL); the pixel resample
    itself would live behind decode_image and is stubbed with it."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def fake_dims(n_bytes: int) -> tuple[int, int]:
            return (n_bytes * 7) % 640 + 1, (n_bytes * 13) % 480 + 1

        def fit(wh: tuple[int, int]) -> tuple[int, int]:
            w, h = wh
            if w <= box and h <= box:
                return w, h
            if w >= h:
                return box, max(1, (h * box) // w)
            return max(1, (w * box) // h), box

        for pdf in batches:
            n_bytes = pdf["payload"].str.len().astype("int64")
            dims = n_bytes.map(fake_dims)
            out = dims.map(fit)
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "in_width": dims.map(lambda d: d[0]).astype("int32"),
                "in_height": dims.map(lambda d: d[1]).astype("int32"),
                "out_width": out.map(lambda d: d[0]).astype("int32"),
                "out_height": out.map(lambda d: d[1]).astype("int32"),
            })

    return resize_batches


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, in/out dims): the resize stage of an image pipeline —
    mapInPandas, narrow, partition-preserving."""
    docs = load_tables(spark, sf_dir)["documents"]
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(_make_resize_batches(), schema=RESIZED_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, frame_idx): fixed-stride frame sampling over a fake video
    (one frame per 64 payload bytes, stride 10). The explode is JVM-side
    (``sequence``), so output size — not Python — dominates cost; at 100 TB
    per-frame rows feed the decode stage above."""
    docs = load_tables(spark, sf_dir)["documents"]
    n_frames = (F.length(F.encode("text", "UTF-8")) / F.lit(64)).cast("bigint")
    return (
        docs.select("doc_id", n_frames.alias("n_frames"))
        .filter(F.col("n_frames") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"),
                           F.col("n_frames") - 1,
                           F.lit(10).cast("bigint"))
            ).alias("frame_idx"),
        )
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bytes, n_spaces, avg_token_len): vectorized feature
    extraction over payload bytes via mapInPandas (the stand-in for an
    embedding/EXIF extractor)."""
    docs = load_tables(spark, sf_dir)["documents"]
    payloads = docs.select("doc_id", F.col("text").alias("payload"))

    def make_fn():
        def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import pandas as _pd

            for pdf in batches:
                t = pdf["payload"]
                n_bytes = t.str.encode("utf-8").str.len().astype("int64")
                n_spaces = (t.str.len() - t.str.replace(" ", "", regex=False).str.len()).astype("int64")
                yield _pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "n_spaces": n_spaces,
                    "avg_token_len": ((n_bytes - n_spaces)
                                      / (n_spaces + 1)).round(6),
                })

        return feature_batches

    return payloads.mapInPandas(
        make_fn(), schema="doc_id bigint, n_bytes bigint, n_spaces bigint, avg_token_len double"
    )
