"""End-to-end incremental pipeline: landing tick → bronze →
silver MERGE into a managed table → versioned reads.

This is the full reference loop (S3 sensor → bronze copy → silver
Iceberg CTAS) in its Spark-first form: the streaming checkpoint is
the sensor cursor, the managed-table MERGE replaces re-CTAS, and
every silver publish is a readable, time-travelable version."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from university_data_lakehouse_spark.functions.keys import surrogate_key
from university_data_lakehouse_spark.sources.systems import BronzeLanding
from university_data_lakehouse_spark.tables import TableCatalog


@pytest.fixture()
def rig(spark, tmp_path):
    return (
        BronzeLanding(
            spark,
            landing_root=str(tmp_path / "landing"),
            bronze_root=str(tmp_path / "bronze"),
            checkpoint_root=str(tmp_path / "ckpt"),
        ),
        TableCatalog(str(tmp_path / "warehouse")),
    )


def _silver_orders(spark, bronze_dir):
    """Minimal conformance transform over bronze orders (surrogate
    key + renames), mirroring silver_fact_orders' shape."""
    return spark.read.parquet(bronze_dir).select(
        surrogate_key("o_orderkey").alias("transaction_key"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").alias("posting_date"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("amount"),
    )


def test_landing_to_silver_incremental(spark, sf_dir, rig):
    landing, catalog = rig
    d = landing.landing_dir("erp", "orders")
    os.makedirs(d, exist_ok=True)

    # --- tick 1: first landing file → bronze → silver v1 (overwrite)
    shutil.copy(os.path.join(sf_dir, "orders.parquet"),
                os.path.join(d, "data_001.parquet"))
    got = landing.tick("erp")
    n1 = got["orders"]
    assert n1 > 0
    t = catalog.table("silver/fact_orders")
    silver = _silver_orders(spark, landing.bronze_dir("erp", "orders"))
    t.write(silver, mode="overwrite")
    assert t.read(spark).count() == n1

    # --- tick 2: replayed file (same keys) → MERGE is idempotent
    shutil.copy(os.path.join(sf_dir, "orders.parquet"),
                os.path.join(d, "data_002.parquet"))
    assert landing.tick("erp")["orders"] == n1  # cursor: only the new file
    silver2 = _silver_orders(spark, landing.bronze_dir("erp", "orders"))
    # bronze now holds the replay too; dedupe to latest per key before
    # the merge, as a production incremental slice would
    latest = silver2.groupBy("transaction_key").agg(
        F.max("orderkey").alias("orderkey"),
        F.max("posting_date").alias("posting_date"),
        F.max("status").alias("status"),
        F.max("amount").alias("amount"),
    )
    v = t.merge(latest, keys=["transaction_key"])
    assert v == 2
    assert t.read(spark).count() == n1          # same keys → pure update
    assert t.read(spark, version=1).count() == n1  # v1 still readable
    # freshness: just-ingested bronze passes the erp SLA
    fresh = landing.freshness("erp")
    assert fresh["orders"]["passed"], fresh
