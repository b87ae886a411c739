"""Multimodal column plumbing (SURVEY §2.8).

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` pipelines.
The Spark-side plumbing — schemas, batch iteration, partitioning,
UDF signatures — is real and tested; the actual codec step is STUBBED
(image/audio libraries are not in this container): ``decode_stub``
produces a deterministic fake "decoded" feature block and
``decode_real`` raises NotImplementedError with the intended
dependency documented.

Scale notes: mapInPandas streams Arrow record batches — payload bytes
never materialize row-at-a-time in Python; batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch. Feature extraction is a
narrow map (no shuffle); downstream joins treat the metadata columns
as ordinary scan-prunable columns.
"""

from __future__ import annotations

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
}

ORACLES = {
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
