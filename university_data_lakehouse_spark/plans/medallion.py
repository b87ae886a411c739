"""The default bronze→silver→gold medallion asset graph — the
engine's equivalent of the reference's full Dagster deployment
(bronze ingestion component + silver transform component + gold
analytics component wired together).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import gold as gold_ops
from ..operators import silver as silver_ops
from ..sources.loader import load_table
from .assets import Asset, AssetGraph
from .checks import (
    accepted_values,
    completeness,
    no_duplicates,
    not_null_pk,
    row_count,
)

_BRONZE = ("region", "nation", "customer", "supplier", "part",
           "orders", "lineitem")


def _bronze_asset(name: str) -> Asset:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return load_table(spark, sf_dir, name)

    return Asset(
        key=f"bronze/{name}", fn=fn, group="bronze",
        tags={"layer": "bronze", "source": name}, kind="parquet",
        checks=(("row_count", row_count(1)),),
    )


def _silver_asset(key: str, fn, deps: tuple[str, ...], pk: str,
                  unique: bool, extra_checks: tuple = ()) -> Asset:
    """Check lists mirror the reference per-transform
    ``data_quality_checks`` (defs/silver_transforms/defs.yaml): dims
    demand unique surrogate keys; facts don't (a fact grain can
    legitimately repeat its natural key — as this testdata does)."""
    checks = [("not_null_pk", not_null_pk(pk)), ("row_count", row_count(1))]
    if unique:
        checks.insert(1, ("no_duplicates", no_duplicates(pk)))
    checks.extend(extra_checks)
    return Asset(
        key=f"silver/{key}",
        fn=lambda spark, sf_dir, **_: fn(spark, sf_dir),
        deps=deps,
        group="silver",
        tags={"layer": "silver"},
        kind="spark",
        checks=tuple(checks),
    )


def _gold_asset(key: str, fn, deps: tuple[str, ...], complete_col: str) -> Asset:
    return Asset(
        key=f"gold/{key}",
        fn=lambda spark, sf_dir, **_: fn(spark, sf_dir),
        deps=deps,
        group="gold",
        tags={"layer": "gold", "tier": "Gold"},
        kind="spark",
        checks=(
            ("row_count", row_count(1)),
            ("completeness", completeness(complete_col, 0.9)),
        ),
    )


def incremental_fact_orders(spark: SparkSession, sf_dir: str, catalog,
                            since_orderkey: int | None = None) -> int:
    """MERGE-based incremental materialization for silver/fact_orders
    (the reference's sensor-driven re-materialization, but as an
    upsert instead of a full CTAS): recompute only the slice of the
    fact with orderkey > cursor and MERGE it into the managed table
    on the surrogate key. Returns the committed version.

    At 100 TB the source slice comes from the landing cursor
    (streaming/ingestion.py); the merge shuffles only slice + table,
    never recomputes history.

    A never-materialized table bootstraps with a full overwrite (a
    MERGE into nothing is just the initial load) instead of failing
    mid-merge on a missing manifest.
    """
    full = silver_ops.silver_fact_orders(spark, sf_dir)
    table = catalog.table("silver/fact_orders")
    if not table.exists():
        return table.write(full, mode="overwrite", operation="bootstrap")
    src = full if since_orderkey is None else full.where(
        full.orderkey > since_orderkey
    )
    return table.merge(src, keys=["transaction_key"])


def incremental_fact_lineitems(spark: SparkSession, sf_dir: str, catalog,
                               since_orderkey: int | None = None) -> int:
    """Composite-key MERGE incremental for silver/fact_lineitems: the
    lineitem grain's natural key is (orderkey, linenumber), so the
    upsert anti-joins on BOTH columns — one shuffle on the composite
    key, exactly the multi-key MERGE tables/format.py already
    supports. Same bootstrap-on-first-run semantics as
    incremental_fact_orders.

    Scale note: merging on the NATURAL key also unlocks the table
    layer's footer-stats data skipping — an orderkey-sloped slice
    prunes to the tail files. fact_orders merges on its md5 surrogate
    key, whose uniform distribution makes every file's range overlap
    (skipping degrades to a full rewrite, correct but unpruned) —
    the classic reason incremental upserts should key on natural or
    monotonic columns."""
    full = silver_ops.silver_fact_lineitems(spark, sf_dir)
    table = catalog.table("silver/fact_lineitems")
    if not table.exists():
        return table.write(full, mode="overwrite", operation="bootstrap")
    src = full if since_orderkey is None else full.where(
        full.orderkey > since_orderkey
    )
    return table.merge(src, keys=["orderkey", "linenumber"])


def medallion_graph() -> AssetGraph:
    bronze = [_bronze_asset(n) for n in _BRONZE]
    silver = [
        _silver_asset("dim_customers", silver_ops.silver_dim_customers,
                      ("bronze/customer", "bronze/nation", "bronze/orders"),
                      "customer_key", unique=True),
        _silver_asset("dim_parts", silver_ops.silver_dim_parts,
                      ("bronze/part",), "part_key", unique=True),
        _silver_asset("dim_suppliers", silver_ops.silver_dim_suppliers,
                      ("bronze/supplier", "bronze/nation", "bronze/region"),
                      "supplier_key", unique=True),
        _silver_asset("fact_lineitems", silver_ops.silver_fact_lineitems,
                      ("bronze/lineitem", "bronze/orders"), "lineitem_key",
                      unique=False),
        _silver_asset("fact_orders", silver_ops.silver_fact_orders,
                      ("bronze/orders", "bronze/customer"), "transaction_key",
                      unique=True,
                      extra_checks=(("accepted_status",
                                     accepted_values("status",
                                                     ["O", "F", "P"])),)),
        _silver_asset("fact_contacts", silver_ops.silver_fact_contacts,
                      ("bronze/customer", "bronze/orders", "bronze/lineitem"),
                      "contact_key", unique=True),
    ]
    gold = [
        _gold_asset("order_metrics", gold_ops.gold_order_metrics,
                    ("silver/fact_lineitems", "silver/dim_customers"),
                    "segment"),
        _gold_asset("revenue_analytics", gold_ops.gold_revenue_analytics,
                    ("silver/fact_lineitems", "silver/dim_customers",
                     "silver/fact_orders"),
                    "total_offered"),
        _gold_asset("status_funnel", gold_ops.gold_status_funnel,
                    ("silver/fact_contacts",), "expected_revenue"),
    ]
    return AssetGraph(bronze + silver + gold)
