"""PySpark-native analytics engine with the query and data-processing
capabilities of the thomasganka/university-data-lakehouse reference
(a Dagster + Trino/Iceberg medallion lakehouse), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst,
designed for 100 TB scale (broadcast dims, partial aggregation,
AQE skew handling, pushdown-friendly scans).

Layout (see SURVEY.md §3):
- ``session``   tuned SparkSession factory
- ``sources``   schema registry + parquet loaders (bronze layer)
- ``functions`` column helpers (surrogate keys, decimal-exact money,
                deterministic vector math, text metrics)
- ``operators`` silver / gold / quality / olap / events / dedup /
                similarity / text / multimodal
- ``streaming`` ingestion, windowed aggs, stateful sessions
- ``plans``     asset graph, lineage, check gating, schedules, selection
"""

__version__ = "0.1.0"
