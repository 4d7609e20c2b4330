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
from pyspark.sql import DataFrame, SparkSession, Window
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
    payload like a real decoder would.

    The checksum is the 60-bit md5-hex-prefix integer masked to 31 bits —
    the same cross-engine base hash the dedup operators use, so DuckDB
    recomputes it bit-identically:
    ``('0x' || substr(md5(x),1,15))::UBIGINT & 2147483647``."""
    if not payload:
        raise ValueError("cannot decode empty payload")
    import hashlib

    checksum = int(hashlib.md5(payload).hexdigest()[:15], 16) & 0x7FFFFFFF
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


@query(
    "multimodal_decode_features",
    # The corpus payloads are UTF-8 text bytes, never a parseable image
    # (no document starts with a P6/BM header), so every row takes the
    # deterministic quarantine path — whose md5-derived values DuckDB
    # recomputes bit-identically. The real-image branch is pixel-checked
    # in pytest (test_spark_decode_and_resize_real_images).
    oracle="""
    WITH d AS (
      SELECT (CAST(('0x' || substr(md5(text), 1, 15))::UBIGINT AS BIGINT)
              & 2147483647) AS checksum,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT COUNT(*) AS n_decoded,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MIN(64 + checksum % 1024) AS INT) AS min_width,
           CAST(MAX(64 + (checksum // 1024) % 1024) AS INT) AS max_height,
           CAST(SUM(checksum) AS BIGINT) AS checksum_total
    FROM d
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction summary over decoded payloads (Arrow-batched
    mapInPandas decode; value-oracled via the md5-derived quarantine
    codec)."""
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


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(len(range(0, (octet_length(encode(text)) - 1) // 32 + 1, 4))
                AS BIGINT) AS n_frames,
           CAST(list_sum(list_transform(
                  range(0, (octet_length(encode(text)) - 1) // 32 + 1, 4),
                  k -> least(32, octet_length(encode(text)) - 32 * k)))
                AS BIGINT) AS sampled_bytes
    FROM documents
    WHERE octet_length(encode(text)) > 0
    ORDER BY doc_id
    LIMIT 100
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Frame sampling' pattern: explode a payload into fixed-size 32-byte
    frames (stand-in for video frame extraction), keep every 4th frame.
    The frame index set is generated JVM-side (sequence + explode — no
    Python, no regex over the payload) and each frame's size is
    ``least(32, n_bytes - 32*idx)``, so the whole pipeline stays in
    whole-stage codegen."""
    t = load_tables(spark, sf_dir, ("documents",))
    payloads = with_binary_payload(t["documents"])
    frames = (
        payloads.select("doc_id", F.octet_length("payload").alias("n_bytes"))
        .filter(F.col("n_bytes") > 0)
        .select(
            "doc_id",
            "n_bytes",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.expr("CAST((n_bytes - 1) DIV 32 AS INT)"),
                    F.lit(4),
                )
            ).alias("frame_idx"),
        )
    )
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum(
                F.least(F.lit(32), F.col("n_bytes") - 32 * F.col("frame_idx"))
            ).alias("sampled_bytes"),
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


@query(
    "multimodal_resize",
    # Text payloads (the whole corpus — no image headers present) take the
    # quarantine resize: output = payload repeated then truncated to
    # (128*96)//64 = 192 bytes. The corpus is pure ASCII (verified: char
    # length == octet length for every sf), so DuckDB's char-based
    # repeat/substring reproduces the byte-exact output and min_fp keeps
    # the oracle content-bearing, not just shape-bearing.
    oracle="""
    WITH r AS (
      SELECT substring(repeat(text, CAST(ceil(192.0 / length(text)) AS INT)),
                       1, 192) AS rz,
             octet_length(encode(text)) AS orig_bytes
      FROM documents
      WHERE length(text) > 0
    )
    SELECT COUNT(*) AS n_images,
           CAST(SUM(length(rz)) AS BIGINT) AS total_resized_bytes,
           CAST(SUM(CASE WHEN length(rz) = 192 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact,
           MIN(orig_bytes) AS min_orig,
           MIN(md5(rz)) AS min_fp
    FROM r
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing summary: every output payload must have exactly the
    target-area-derived size, and min_fp hashes the resized bytes so the
    oracle checks the content that crossed the Arrow boundary."""
    t = load_tables(spark, sf_dir, ("documents",))
    resized = resize_images(with_binary_payload(t["documents"]), 128, 96)
    expected = max(1, (128 * 96) // 64)
    return resized.agg(
        F.count("*").alias("n_images"),
        F.sum(F.length("resized")).alias("total_resized_bytes"),
        F.sum((F.length("resized") == expected).cast("int")).alias("n_exact"),
        F.min("orig_bytes").alias("min_orig"),
        F.min(F.md5("resized")).alias("min_fp"),
    )


# ---------------------------------------------------------------------------
# Audio: real RIFF/WAV PCM codec (stdlib struct — no audio libs needed)
# ---------------------------------------------------------------------------

_WAV_RATE = 8000  # Hz, 16-bit mono PCM


def synth_wav(doc_id: int) -> bytes:
    """A REAL canonical RIFF/WAVE file (44-byte PCM header + int16 LE
    data) whose sample values are a pure function of ``doc_id`` — the
    audio analogue of the deterministic image payloads: the bytes are
    genuinely parseable by any WAV reader, while every derived statistic
    stays closed-form for the SQL oracle."""
    import struct

    n = 100 + (doc_id % 400)
    samples = (((doc_id * 31 + np.arange(n, dtype=np.int64) * 7) % 2048)
               - 1024).astype("<i2")
    data = samples.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, _WAV_RATE,
                                _WAV_RATE * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def parse_wav(b: bytes) -> tuple[int, int, int, int, int]:
    """(sample_rate, n_samples, duration_ms, peak, pcm_sum) via real RIFF
    chunk walking — finds 'fmt ' and 'data' wherever they sit rather than
    assuming fixed offsets; raises on anything that isn't 16-bit PCM."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos:pos + 4], struct.unpack("<I", b[pos + 4:pos + 8])[0]
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            _fmt, channels, rate, _bps, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"unsupported PCM layout: {bits}-bit x{channels}")
    pcm = np.frombuffer(data, dtype="<i2").astype(np.int64)
    return (rate, len(pcm), len(pcm) * 1000 // rate,
            int(np.abs(pcm).max()) if len(pcm) else 0, int(pcm.sum()))


@query(
    "multimodal_audio_stats",
    oracle=f"""
    WITH clips AS (
      SELECT source, 100 + (doc_id % 400) AS n,
             list_max(list_transform(generate_series(0, 99 + (doc_id % 400)),
               i -> abs(((doc_id * 31 + i * 7) % 2048) - 1024))) AS peak,
             list_sum(list_transform(generate_series(0, 99 + (doc_id % 400)),
               i -> ((doc_id * 31 + i * 7) % 2048) - 1024)) AS s
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_clips,
           CAST(SUM(n) AS BIGINT) AS total_samples,
           CAST(SUM(n // 8) AS BIGINT) AS total_duration_ms,
           CAST(MAX(peak) AS BIGINT) AS max_peak,
           CAST(SUM(s) AS BIGINT) AS pcm_sum
    FROM clips
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio as an opaque binary column: synthesize a real WAV per doc,
    then decode with the real chunk-walking parser — both inside ONE
    ``mapInPandas`` pass (Arrow-batched, bytes never leave the executor),
    then aggregate per source. The oracle recomputes every statistic
    closed-form from the generation rule, so header parsing, PCM
    extraction, and the duration/peak/sum math are all value-checked.
    At 100 TB the same operator reads payloads from parquet binary
    columns; per-task memory is one Arrow batch of clips."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "source")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
                rate, n, dur, peak, ssum = parse_wav(synth_wav(int(doc_id)))
                rows.append((source, rate, n, dur, peak, ssum))
            yield pd.DataFrame(rows, columns=[
                "source", "rate", "n", "dur", "peak", "ssum"])

    clip = docs.mapInPandas(
        stats, "source string, rate int, n long, dur long, peak long, "
               "ssum long")
    return (
        clip.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_clips"),
             F.sum("n").alias("total_samples"),
             F.sum("dur").alias("total_duration_ms"),
             F.max("peak").alias("max_peak"),
             F.sum("ssum").alias("pcm_sum"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Scene-change detection over sampled frames (signature deltas)
# ---------------------------------------------------------------------------

@query(
    "multimodal_scene_changes",
    oracle="""
    WITH fr AS (
      SELECT doc_id, k,
             substr(text, (32 * k + 1)::INT, 32) AS f
      FROM documents,
           UNNEST(range(0, (len(text) - 1) // 32 + 1)) AS t(k)
      WHERE len(text) > 0
    ), sig AS (
      SELECT doc_id, k,
             CAST(list_sum(list_transform(range(1, len(f) + 1),
                           i -> ord(substr(f, i::INT, 1)))) AS BIGINT) AS s
      FROM fr
    ), d AS (
      SELECT doc_id, k, s,
             abs(s - lag(s) OVER (PARTITION BY doc_id ORDER BY k))
               AS delta
      FROM sig
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(CASE WHEN delta > 64 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_scene_changes,
           CAST(COALESCE(MAX(delta), 0) AS BIGINT) AS max_delta,
           CAST(SUM(s) AS BIGINT) AS total_sig
    FROM d GROUP BY doc_id ORDER BY doc_id LIMIT 100
    """,
)
def multimodal_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection over the frame stream — the temporal
    pattern on top of multimodal_frame_sample's spatial one: every
    32-byte frame gets a content signature (byte-code sum — the
    deterministic stand-in for a perceptual hash; the real pHash slots
    into the same shape), consecutive signatures are differenced with a
    per-video LAG, and a delta above the threshold marks a cut. Output:
    frames, cuts, max delta and the signature checksum for the first
    100 payloads.

    Scale shape: frame explosion and signatures are pure JVM column
    work inside the scan stage (sequence + substring + aggregate over
    code points — whole-stage codegen, no Python); the only exchange is
    the per-video window/rollup key (doc_id), which is ALSO how a real
    video pipeline partitions (one video's frames must colocate;
    videos parallelize). A 100 TB video corpus runs this exact plan
    with the codec swapped in behind the same frame/signature schema."""
    t = load_tables(spark, sf_dir, ("documents",))
    # char-domain frames (1 char = 1 byte on this ASCII corpus; for a
    # real binary payload the same plan runs over byte offsets)
    fr = (t["documents"]
          .select("doc_id", "text", F.length("text").alias("n_chars_t"))
          .filter(F.col("n_chars_t") > 0)
          .select("doc_id",
                  F.explode(F.sequence(
                      F.lit(0),
                      F.expr("CAST((n_chars_t - 1) DIV 32 AS INT)")))
                   .alias("k"),
                  "text")
          .select("doc_id", "k",
                  F.expr("substring(text, 32 * k + 1, 32)").alias("f")))
    sig = fr.select(
        "doc_id", "k",
        F.expr("aggregate(sequence(1, length(f)), 0L,"
               " (a, i) -> a + ascii(substring(f, i, 1)))").alias("s"))
    w = Window.partitionBy("doc_id").orderBy("k")
    d = sig.withColumn("delta", F.abs(F.col("s") - F.lag("s").over(w)))
    return (d.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_frames"),
                 F.sum((F.col("delta") > 64).cast("bigint"))
                  .alias("n_scene_changes"),
                 F.coalesce(F.max("delta"), F.lit(0)).cast("bigint")
                  .alias("max_delta"),
                 F.sum("s").cast("bigint").alias("total_sig"))
            .orderBy("doc_id").limit(100))
