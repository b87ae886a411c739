"""File-source landing→bronze streaming ingestion.

Reference parity: the per-source S3 sensors in
``components/s3_data_landing_component.py:198-269`` — cursor-based
incremental discovery of new landing files — and the landing→bronze
copy at lines 94-159. Structured Streaming's file source with a
checkpoint IS that sensor: the checkpointed file list is the cursor,
``trigger(availableNow=True)`` is one sensor tick (process everything
new, then stop), and the output dir is the bronze table.

Scale notes: ``maxFilesPerTrigger`` bounds per-batch work
(backpressure); ``latestFirst`` lets a backlogged stream catch up on
fresh data first. The sink partitions by ingest date so bronze scans
prune by date — at 100 TB this is the difference between a day scan
and a full-history scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def landing_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """readStream over a landing directory (S3 prefix at scale).
    ``options`` carries format-specific reader options (e.g. CSV
    header handling) — see sources.systems.FORMAT_OPTIONS."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.load(landing_dir)
        .withColumn("_ingested_at", F.current_timestamp())
        .withColumn("_ingest_date", F.current_date())
        .withColumn("_source_file", F.input_file_name())
    )


def ingest_available_now(
    stream_df: DataFrame,
    bronze_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """One sensor tick: process every not-yet-seen landing file
    (checkpoint = cursor), append to bronze, stop. The sink
    partitions by ingest date so bronze scans prune to the days they
    touch (the 100 TB day-scan-vs-history-scan difference)."""
    writer = stream_df.writeStream.format("parquet")
    if "_ingest_date" in stream_df.columns:
        writer = writer.partitionBy("_ingest_date")
    return (
        writer.option("path", bronze_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def freshness_check(
    spark: SparkSession, bronze_dir: str, ts_col: str, max_age_hours: float,
    now=None,
) -> dict:
    """Freshness asset check (parity:
    s3_data_landing_component.py:165-196): newest row age vs SLA."""
    df = spark.read.parquet(bronze_dir)
    row = df.agg(F.max(ts_col).alias("latest")).collect()[0]
    latest = row["latest"]
    if latest is None:
        return {"passed": False, "latest": None, "reason": "empty table"}
    now = now or __import__("datetime").datetime.now(tz=latest.tzinfo)
    age_h = (now - latest).total_seconds() / 3600.0
    return {"passed": age_h <= max_age_hours, "latest": latest,
            "age_hours": age_h}
