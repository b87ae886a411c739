"""Tuned SparkSession factory.

Settings chosen for correctness parity with the DuckDB oracle
(UTC session timezone; Spark 4's DEFAULT ANSI mode is kept ON — all
oracle-checked operators are green under it, and every division an
operator can feed a zero is NULLIF-guarded, see dq_ks_drift) and for
scale (AQE on, skew-join handling, Arrow for any pandas exchange,
bounded shuffle partitions on local mode).

On a real cluster the same builder is used; only master/memory come
from the environment (spark-submit), never hardcoded here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "university-data-lakehouse-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = str(
        shuffle_partitions
        or os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        # testdata events.ts is parquet TIMESTAMP(NANOS); read as long,
        # loader converts to microsecond timestamps (DuckDB-equivalent)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # JVM unified logging (-Xlog) writes [warning][gc,alloc] lines to
        # the JVM's STDOUT, which in client mode is the same stream a
        # caller capturing `python bench.py > BENCH.json` records — one
        # GCLocker warning corrupts the JSON artifact (observed r11).
        # Disable UL entirely; log4j application logging is unaffected.
        # composed, not replaced: a caller adding GC-tuning flags via
        # the env var must not silently re-enable UL and bring the
        # corruption back.
        # FRESH-JVM ONLY: extraJavaOptions binds when THIS builder
        # launches the driver JVM; with a pre-existing gateway/session
        # (tune_existing path, pyspark shell, PYSPARK_SUBMIT_ARGS) it
        # is silently inert — bench.py asserts the option actually
        # landed before trusting its stdout JSON
        .config(
            "spark.driver.extraJavaOptions",
            ("-Xlog:disable "
             + os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "")).strip(),
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable knobs to an externally created session
    (the driver hands us one); only touches dynamically settable confs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf in this deployment — keep going
    return spark
