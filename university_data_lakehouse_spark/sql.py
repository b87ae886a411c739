"""SQL entry point: the engine's whole surface as ``spark.sql``.

The reference's only query language is SQL — every silver/gold
semantic lives in a Trino SQL string inside ``defs/*/defs.yaml``,
executed as CTAS. This module gives the Spark engine the same front
door: register the source tables (and optionally every operator's
output) as temp views, and any ANSI query — including the silver/gold
transforms themselves — runs through ``spark.sql`` with the identical
Catalyst plan the DataFrame API produces (same optimizer, same
physical strategies; the API choice is syntax, not capability).

Scale note: temp views are metadata only — registering a view neither
scans nor caches; Catalyst still sees the parquet relation underneath
and pushes filters/prunes columns exactly as for DataFrame reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.loader import load_table

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every source table as a temp view named after it (the
    same names the DuckDB oracle gate uses), so ANSI queries run
    as-is: ``spark.sql("SELECT ... FROM lineitem JOIN orders ...")``.
    Returns the registered view names."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(TABLES)


def register_model_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every operator's OUTPUT as a temp view keyed by its
    registry name, so downstream consumers query models by name
    (``SELECT * FROM gold_order_metrics WHERE ...``) — the engine's
    equivalent of the reference's named Iceberg tables. Lazy: a view
    only executes when queried."""
    import importlib  # noqa: PLC0415

    entry = importlib.import_module("__spark_entry__")
    names = []
    for key, fn in entry.queries().items():
        fn(spark, sf_dir).createOrReplaceTempView(key)
        names.append(key)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call convenience: ensure source views exist, run the query."""
    register_views(spark, sf_dir)
    return spark.sql(query)
