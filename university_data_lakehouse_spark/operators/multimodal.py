"""Multimodal column plumbing (SURVEY §2.8).

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` pipelines.

Two decode tiers:

- REAL header decode for public byte formats that need no codec
  library: ``parse_media_header`` walks actual BMP (BITMAPINFOHEADER)
  and WAV (RIFF chunk) bytes for width/height/sample-rate/sample
  count; ``media_table_encoded`` synthesizes valid struct-packed
  BMP/WAV payloads so the round trip (pack → Spark binary column →
  Arrow batch → parse) is exercised end to end and oracle-checked
  (``multimodal_decoded``).
- STUB for pixel/sample-level work that genuinely requires a codec
  (JPEG/MP3/H.264 — libraries not in this container):
  ``decode_stub`` produces a deterministic fake feature block and
  ``decode_real`` raises NotImplementedError with the intended
  dependency documented.

Scale notes: mapInPandas streams Arrow record batches — payload bytes
never materialize row-at-a-time in Python; batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch. Feature extraction is a
narrow map (no shuffle); downstream joins treat the metadata columns
as ordinary scan-prunable columns.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.loader import load_table

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),    # image | audio | video
    StructField("payload", BinaryType()),       # opaque encoded bytes
    StructField("payload_len", LongType()),
    StructField("magic_hex", StringType()),     # first-4-bytes signature
])

HEADER_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_ms", DoubleType()),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload_len", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("features", ArrayType(DoubleType())),
])


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents: utf-8 payload bytes as
    the opaque binary column (the plumbing is identical for real
    image/audio bytes), typed metadata derived JVM-side."""
    doc = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return doc.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("payload_len"),
        F.hex(F.substring(payload, 1, 4)).alias("magic_hex"),
    )


def synth_media_payload(doc_id: int, media_type: str, text: str) -> bytes:
    """Deterministic, VALID media bytes per row: a 24-bit BMP for
    images, a 16-bit mono PCM WAV for audio (shape parameters are pure
    functions of doc_id so the decoded metadata is oracle-checkable),
    and the raw utf-8 text for video (opaque — no header-only public
    container is parseable without a codec)."""
    if media_type == "image":
        width = 4 + doc_id % 16
        height = 4 + (doc_id // 16) % 16
        row = (width * 3 + 3) & ~3          # rows padded to 4 bytes
        pix_size = row * height
        header = struct.pack(
            "<2sIHHI", b"BM", 54 + pix_size, 0, 0, 54
        ) + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pix_size,
            2835, 2835, 0, 0,
        )
        pixels = bytes((doc_id + i) % 256 for i in range(pix_size))
        return header + pixels
    if media_type == "audio":
        sample_rate = 8000 + (doc_id % 8) * 1000
        n_samples = 100 + doc_id % 400
        data = struct.pack(
            f"<{n_samples}h",
            *(((doc_id * 31 + i * 7) % 65536) - 32768 for i in range(n_samples)),
        )
        return (
            struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
            + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
                          sample_rate * 2, 2, 16)
            + struct.pack("<4sI", b"data", len(data))
            + data
        )
    return text.encode("utf-8")


def parse_media_header(payload: bytes) -> dict:
    """REAL byte-level header parse, dispatched on magic bytes:

    - BMP: width/height from the BITMAPINFOHEADER int32 fields at
      offsets 18/22 (public format spec; height may be negative for
      top-down rows — absolute value is the pixel height).
    - WAV: walks RIFF chunks from offset 12; ``fmt `` gives channels/
      sample-rate/block-align, ``data`` gives payload size, so
      n_samples = data_size / block_align.
    - anything else: all-None metadata (opaque payload).
    """
    none = {"width": None, "height": None, "sample_rate": None,
            "n_samples": None, "duration_ms": None}
    if payload[:2] == b"BM" and len(payload) >= 26:
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = abs(int.from_bytes(payload[22:26], "little", signed=True))
        return {**none, "width": width, "height": height}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, sample_rate, block_align, data_size = 12, None, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            size = int.from_bytes(payload[pos + 4:pos + 8], "little")
            if cid == b"fmt " and size >= 16:
                _fmt, _ch, sample_rate, _br, block_align, _bits = struct.unpack(
                    "<HHIIHH", payload[pos + 8:pos + 24]
                )
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)    # RIFF chunks pad to even
        if sample_rate and block_align and data_size is not None:
            n_samples = data_size // block_align
            return {**none, "sample_rate": sample_rate,
                    "n_samples": n_samples,
                    "duration_ms": n_samples * 1000.0 / sample_rate}
    return none


def decode_real(payload: bytes, media_type: str) -> dict:
    """Real decoder entry point — requires Pillow / torchaudio / pyav,
    which are NOT in this container. Clearly-marked stub boundary."""
    raise NotImplementedError(
        "media decoding requires Pillow (image), soundfile/torchaudio "
        "(audio), or pyav (video); wire them here and remove decode_stub"
    )


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode: shape metadata + an 8-dim feature
    block derived from payload bytes (stable across runs/engines)."""
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    n_frames = 1 if media_type == "image" else 1 + n % 30
    # chunk-sum "features": mean byte value per 8 equal chunks
    feats = []
    step = max(n // 8, 1)
    for i in range(8):
        chunk = payload[i * step:(i + 1) * step]
        feats.append(float(sum(chunk)) / len(chunk) if chunk else 0.0)
    return {"width": width, "height": height, "n_frames": n_frames,
            "features": feats}


def media_table_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table whose binary payloads are VALID encoded files
    (BMP/WAV via synth_media_payload; video rows stay opaque).
    Synthesis runs in the same Arrow-batched mapInPandas shape the
    decode uses — in production these bytes arrive from object
    storage instead."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        "text",
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                synth_media_payload(int(d), m, t)
                for d, m, t in zip(pdf["doc_id"], pdf["media_type"], pdf["text"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "payload": payloads,
                "payload_len": pd.Series([len(p) for p in payloads],
                                         dtype="int64"),
                "magic_hex": [p[:4].hex().upper() for p in payloads],
            })

    return doc.mapInPandas(synth, schema=MEDIA_SCHEMA)


def decode_headers(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL header decode over mapInPandas: each batch's
    payload bytes are parsed by parse_media_header (BMP/WAV walkers);
    unknown formats yield null metadata. Narrow map — no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_media_header(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": pd.array([m["width"] for m in metas], dtype="Int32"),
                "height": pd.array([m["height"] for m in metas], dtype="Int32"),
                "sample_rate": pd.array([m["sample_rate"] for m in metas],
                                        dtype="Int32"),
                "n_samples": pd.array([m["n_samples"] for m in metas],
                                      dtype="Int64"),
                "duration_ms": pd.array([m["duration_ms"] for m in metas],
                                        dtype="float64"),
            })

    return media.mapInPandas(run, schema=HEADER_SCHEMA)


def multimodal_decoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL decode pipeline: synthesize valid BMP/WAV
    payloads, push them through the Arrow decode stage, return the
    parsed header metadata. Oracle-checkable because the shape
    parameters are pure functions of doc_id — so DuckDB predicts
    exactly what the byte-level round trip must recover."""
    return decode_headers(media_table_encoded(spark, sf_dir))


def decode_features(media: DataFrame, batch_decoder=decode_stub) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "payload_len": pdf["payload_len"],
            }
            decoded = [
                batch_decoder(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            out["width"] = pd.Series([d["width"] for d in decoded], dtype="int32")
            out["height"] = pd.Series([d["height"] for d in decoded], dtype="int32")
            out["n_frames"] = pd.Series([d["n_frames"] for d in decoded], dtype="int32")
            out["features"] = pd.Series([d["features"] for d in decoded])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, target: int = 224) -> DataFrame:
    """Resize pipeline stage (stub): keeps the binary payload opaque,
    records the intended target dims — the Spark plumbing (narrow map,
    binary passthrough) matches what a real resize UDF needs."""
    return media.withColumn("resize_target", F.lit(target))


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: emits (doc_id, frame_idx)
    rows JVM-side from stubbed frame counts — the explode shape real
    frame sampling needs (one output row per sampled frame)."""
    frames = decode_features(media).where(F.col("media_type") == "video")
    return frames.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the media table: byte stats + typed
    metadata (everything except the Python decode stage)."""
    media = media_table(spark, sf_dir)
    return media.select(
        "doc_id", "media_type", "payload_len", "magic_hex",
        F.md5("payload").alias("payload_md5"),
    )


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_decoded": multimodal_decoded,
}

ORACLES = {
    # the decoded metadata must equal the doc_id-derived shape params
    # the payload bytes were packed from (byte-level round trip)
    "multimodal_decoded": """
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INTEGER)
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CASE WHEN doc_id % 3 = 0
                    THEN CAST(4 + doc_id % 16 AS INTEGER) END AS width,
               CASE WHEN doc_id % 3 = 0
                    THEN CAST(4 + (doc_id // 16) % 16 AS INTEGER) END AS height,
               CASE WHEN doc_id % 3 = 1
                    THEN CAST(8000 + (doc_id % 8) * 1000 AS INTEGER)
                    END AS sample_rate,
               CASE WHEN doc_id % 3 = 1
                    THEN CAST(100 + doc_id % 400 AS BIGINT) END AS n_samples,
               CASE WHEN doc_id % 3 = 1
                    THEN (100 + doc_id % 400) * 1000.0
                         / (8000 + (doc_id % 8) * 1000) END AS duration_ms
        FROM documents
    """,
    "multimodal_meta": """
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INTEGER)
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
               upper(hex(substr(text, 1, 4))) AS magic_hex,
               md5(text) AS payload_md5
        FROM documents
    """,
}
