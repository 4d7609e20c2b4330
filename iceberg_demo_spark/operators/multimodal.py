"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The decode step is REAL for image payloads: a pure-numpy codec decodes
P6 PPM and uncompressed 24-bit BMP to pixel arrays (PIL is used instead
when importable), resize is true nearest-neighbor resampling, and
re-encode emits valid PPM. Payloads that aren't a recognized image format
(the synthetic corpus stores UTF-8 text bytes) fall back to a
deterministic byte-derived stand-in so the pipeline keeps flowing — the
behavior a production pipeline implements as a quarantine path.

What the Spark side guarantees either way:

- binary columns built/stored/scanned as `binary` with a struct metadata
  column (mime, width/height, byte length),
- `mapInPandas` feature extraction with an explicit output schema and
  Arrow-batch iteration (whole record batches per Python call),
- byte-level stats computed JVM-side (octet_length etc.) — oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_demo_spark.registry import query
from iceberg_demo_spark.sources import load_tables

try:  # pragma: no cover - not present in this container
    from PIL import Image as _PILImage
except Exception:
    _PILImage = None


# ---------------------------------------------------------------------------
# Real image codec: P6 PPM + 24-bit BMP in pure numpy (PIL when available)
# ---------------------------------------------------------------------------

def _parse_ppm(b: bytes) -> np.ndarray | None:
    """P6 (binary) PPM → (H, W, 3) uint8, or None if not PPM."""
    if not b.startswith(b"P6"):
        return None
    tokens: list[bytes] = []
    i, n = 2, len(b)
    while len(tokens) < 3 and i < n:
        c = b[i:i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":  # comment to end of line
            while i < n and b[i:i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < n and b[j:j + 1] not in b" \t\r\n":
                j += 1
            tokens.append(b[i:j])
            i = j
    if len(tokens) < 3:
        return None
    i += 1  # exactly one whitespace byte after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255 or w <= 0 or h <= 0 or len(b) - i < w * h * 3:
        return None
    return np.frombuffer(b, np.uint8, count=w * h * 3,
                         offset=i).reshape(h, w, 3).copy()


def _parse_bmp(b: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit bottom-up BMP → (H, W, 3) uint8 RGB, or None."""
    if len(b) < 54 or not b.startswith(b"BM"):
        return None
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = abs(h)
    if len(b) < off + stride * rows:
        return None
    raw = np.frombuffer(b, np.uint8, count=stride * rows,
                        offset=off).reshape(rows, stride)
    bgr = raw[:, :w * 3].reshape(rows, w, 3)
    if h > 0:  # positive height = bottom-up row order
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, 3) uint8 RGB array.

    Raises ValueError for empty or unrecognized payloads, like any real
    decoder. Uses PIL when installed; always handles P6 PPM and 24-bit
    BMP via the built-in numpy parsers."""
    if not payload:
        raise ValueError("cannot decode empty payload")
    if _PILImage is not None:
        import io
        try:
            return np.asarray(
                _PILImage.open(io.BytesIO(payload)).convert("RGB"))
        except Exception:
            pass  # fall through to the built-in parsers
    arr = _parse_ppm(payload)
    if arr is None:
        arr = _parse_bmp(payload)
    if arr is None:
        raise ValueError("unrecognized image format")
    return arr


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — the same pixel
    selection rule as PIL's Image.NEAREST."""
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h // height).astype(np.int64)
    cols = (np.arange(width) * w // width).astype(np.int64)
    return arr[rows[:, None], cols[None, :]]


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary P6 PPM bytes (round-trips via _parse_ppm)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


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
    """Deterministic byte-derived (width, height, checksum) for payloads
    that aren't a recognized image format — the quarantine path keeping
    non-image rows flowing with stable, testable values. Raises on empty
    payload like a real decoder would."""
    if not payload:
        raise ValueError("cannot decode empty payload")
    checksum = 0
    for b in payload[:256]:
        checksum = (checksum * 131 + b) & 0x7FFFFFFF
    width = 64 + checksum % 1024
    height = 64 + (checksum >> 10) % 1024
    return width, height, checksum


def _decode_one(payload: bytes) -> tuple[int, int, int]:
    """Real decode when the payload is an image (PPM/BMP/PIL-supported):
    true dimensions + pixel-sum checksum; byte-derived fallback otherwise."""
    try:
        arr = decode_image(payload)
    except ValueError:
        if not payload:
            raise
        return _fake_decode(payload)
    h, w = arr.shape[:2]
    return w, h, int(arr.astype(np.uint64).sum())


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        decoded = [_decode_one(p) for p in pdf["payload"]]
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
    """Byte-derived stand-in used when the payload isn't a recognized
    image: output length scales with the target area and content derives
    from the source bytes, so tests can assert real data flow through the
    Arrow boundary."""
    if not payload:
        raise ValueError("cannot resize empty payload")
    n = max(1, (width * height) // 64)
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def _resize_one(payload: bytes, width: int, height: int) -> bytes:
    """Real decode→nearest-neighbor-resize→PPM re-encode for image
    payloads; byte-derived fallback for everything else."""
    try:
        arr = decode_image(payload)
    except ValueError:
        if not payload:
            raise
        return _fake_resize(payload, width, height)
    return encode_ppm(resize_nearest(arr, width, height))


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
                    "resized": [_resize_one(p, width, height)
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
