"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake behind the real Spark plumbing (schema, Arrow batching,
partitioning). What IS real and tested:

- binary columns built/stored/scanned as `binary` with a struct metadata
  column (mime, width/height, byte length),
- `mapInPandas` feature extraction with an explicit output schema and
  Arrow-batch iteration (the exact shape a real image decoder plugs into),
- byte-level stats computed JVM-side (octet_length etc.) — oracle-checked.

Swap `_fake_decode` for a real codec (PIL/ffmpeg) on a cluster with the
libs installed; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_demo_spark.registry import query
from iceberg_demo_spark.sources import load_tables


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct). The payload is the
    UTF-8 text bytes standing in for an image blob."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Byte-level stats on the binary column (JVM-side; oracle-checked)
# ---------------------------------------------------------------------------

@query(
    "multimodal_payload_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_payloads,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(octet_length(encode(text))) AS max_bytes,
           MIN(octet_length(encode(text))) AS min_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    payloads = with_binary_payload(t["documents"]).join(
        t["documents"].select("doc_id", "source"), "doc_id"
    )
    return (
        payloads.groupBy("source")
        .agg(
            F.count("*").alias("n_payloads"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.max(F.octet_length("payload")).alias("max_bytes"),
            F.min(F.octet_length("payload")).alias("min_bytes"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Decode / feature-extract via mapInPandas (Arrow-batched; fake codec)
# ---------------------------------------------------------------------------

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder.

    A real implementation would be e.g. PIL.Image.open(io.BytesIO(payload));
    unavailable in this container, so derive (width, height, checksum) purely
    from the bytes. Raises on empty payload like a real decoder would.
    """
    if not payload:
        raise ValueError("cannot decode empty payload")
    checksum = 0
    for b in payload[:256]:
        checksum = (checksum * 131 + b) & 0x7FFFFFFF
    width = 64 + checksum % 1024
    height = 64 + (checksum >> 10) % 1024
    return width, height, checksum


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        decoded = [_fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "fake_width": [d[0] for d in decoded],
                "fake_height": [d[1] for d in decoded],
                "checksum": [d[2] for d in decoded],
            }
        )


def decode_features(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode: each executor core pulls record batches, decodes
    in Python, and returns columnar results — the standard multimodal
    feature-extraction shape (mapInPandas, not per-row UDF)."""
    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        _decode_batches, schema=_FEATURE_SCHEMA
    )


@query("multimodal_decode_features")
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction summary over decoded payloads. Rows-only check:
    the fake codec runs Python-side (not expressible in DuckDB SQL)."""
    t = load_tables(spark, sf_dir, ("documents",))
    feats = decode_features(with_binary_payload(t["documents"]))
    return (
        feats.agg(
            F.count("*").alias("n_decoded"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("fake_width").alias("min_width"),
            F.max("fake_height").alias("max_height"),
            F.sum("checksum").alias("checksum_total"),
        )
    )


@query("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Frame sampling' pattern: explode a payload into fixed-size chunks
    (stand-in for video frame extraction), keep every 4th chunk. JVM-side
    (substring on binary) — shows chunking without Python. Rows-only."""
    t = load_tables(spark, sf_dir, ("documents",))
    payloads = with_binary_payload(t["documents"])
    chunked = payloads.select(
        "doc_id",
        F.posexplode(
            F.split(F.col("payload").cast("string"), "(?<=\\G.{32})")
        ).alias("frame_idx", "frame"),
    ).filter((F.col("frame_idx") % 4 == 0) & (F.length("frame") > 0))
    return (
        chunked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum(F.length("frame")).alias("sampled_chars"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Resize via mapInPandas (stubbed codec, real plumbing)
# ---------------------------------------------------------------------------

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("orig_bytes", T.IntegerType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode (a real pipeline
    would be PIL `Image.open(...).resize((w, h)).save(...)`; image libs are
    unavailable in this container). Output length scales with the target
    area and content derives from the source bytes, so tests can assert
    real data flow through the Arrow boundary."""
    if not payload:
        raise ValueError("cannot resize empty payload")
    n = max(1, (width * height) // 64)
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def resize_images(docs_with_payload: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched resize: binary in, binary out, target dims as plain
    columns — the batch shape a real codec UDF would use (whole record
    batches per Python call, never per-row)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "resized": [_fake_resize(p, width, height)
                                for p in pdf["payload"]],
                    "orig_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches, schema=_RESIZE_SCHEMA)


@query("multimodal_resize")
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing summary (rows-only: Python-side fake codec): every
    output payload must have exactly the target-area-derived size."""
    t = load_tables(spark, sf_dir, ("documents",))
    resized = resize_images(with_binary_payload(t["documents"]), 128, 96)
    expected = max(1, (128 * 96) // 64)
    return resized.agg(
        F.count("*").alias("n_images"),
        F.sum(F.length("resized")).alias("total_resized_bytes"),
        F.sum((F.length("resized") == expected).cast("int")).alias("n_exact"),
        F.min("orig_bytes").alias("min_orig"),
    )
