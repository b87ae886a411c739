"""The default bronze→silver→gold medallion asset graph — the
engine's equivalent of the reference's full Dagster deployment
(bronze ingestion component + silver transform component + gold
analytics component wired together).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.joins import maybe_broadcast
from ..functions.money import DEC
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


#: fixed decimal type for partial-aggregate state columns: wide enough
#: that re-summing partials across any number of ticks stays exact,
#: and FIXED so every tick's frame passes the table's schema gate
#: (Spark's sum() would otherwise widen precision tick over tick)
_STATE_DEC = "decimal(30,4)"

_OM_KEYS = ("order_year", "segment", "status")


def _order_metrics_partials(spark: SparkSession, sf_dir: str,
                            since_orderkey: int | None = None,
                            until_orderkey: int | None = None) -> DataFrame:
    """Mergeable partial-aggregate state for gold/order_metrics over an
    orderkey slice: exact decimal sums + row counts for the algebraic
    measures, Datasketches HLL binaries for every COUNT(DISTINCT) —
    the standard incremental-view-maintenance decomposition (sums and
    sketches re-aggregate associatively; a raw COUNT(DISTINCT) does
    not). At 100 TB each tick aggregates ONLY its slice; state stays
    group-cardinality-sized."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    if since_orderkey is not None:
        orders = orders.where(F.col("o_orderkey") > since_orderkey)
    if until_orderkey is not None:
        orders = orders.where(F.col("o_orderkey") <= until_orderkey)
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        joined.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast(DEC)).cast(_STATE_DEC)
            .alias("qty_dec"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast(_STATE_DEC)
            .alias("acct_dec"),
            F.hll_sketch_agg("o_custkey").alias("cust_hll"),
            F.hll_sketch_agg(
                F.when(F.col("l_returnflag") == "R", F.col("o_custkey"))
            ).alias("ret_hll"),
            F.hll_sketch_agg(
                F.when(F.col("c_acctbal") > 0, F.col("o_custkey"))
            ).alias("funded_hll"),
            F.hll_sketch_agg("l_partkey").alias("part_hll"),
        )
    )


def incremental_order_metrics(spark: SparkSession, sf_dir: str, catalog,
                              since_orderkey: int | None = None,
                              until_orderkey: int | None = None) -> int:
    """Incremental maintenance for the gold/order_metrics aggregate:
    each tick aggregates only its order slice into partials, then
    re-combines them with the stored state (decimal sums add; HLL
    sketches union) and MERGEs the result back on the group keys —
    gold stays fresh without ever re-scanning history, completing
    bronze→silver→gold incrementality. Bootstrap-on-first-run like
    the silver incrementals. Returns the committed version."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    state = catalog.table("gold/order_metrics_state")
    delta = _order_metrics_partials(spark, sf_dir,
                                    since_orderkey, until_orderkey)
    if not state.exists():
        return state.write(delta, mode="overwrite", operation="bootstrap")
    combined = (
        state.read(spark).unionByName(delta)
        .groupBy(*_OM_KEYS)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("qty_dec").cast(_STATE_DEC).alias("qty_dec"),
            F.sum("acct_dec").cast(_STATE_DEC).alias("acct_dec"),
            F.hll_union_agg("cust_hll").alias("cust_hll"),
            F.hll_union_agg("ret_hll").alias("ret_hll"),
            F.hll_union_agg("funded_hll").alias("funded_hll"),
            F.hll_union_agg("part_hll").alias("part_hll"),
        )
    )
    return state.merge(combined, keys=list(_OM_KEYS))


def finalize_order_metrics(spark: SparkSession, catalog,
                           version: int | None = None) -> DataFrame:
    """Derive the user-facing gold/order_metrics frame from the
    partial-aggregate state (any time-travel version): estimates come
    from the stored sketches, algebraic measures from the exact sums —
    same columns as gold_order_metrics(approx_distinct=True)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    st = catalog.table("gold/order_metrics_state").read(spark, version)

    def est(col: str):
        # a group where no row matched the conditional keeps a null
        # sketch (hll_union_agg skips nulls) -> 0 distinct
        return F.coalesce(
            F.hll_sketch_estimate(F.col(col)), F.lit(0).cast("long"))

    return st.select(
        *_OM_KEYS,
        est("cust_hll").alias("total_customers"),
        F.col("qty_dec").cast("double").alias("total_qty"),
        (F.col("acct_dec").cast("double") / F.col("n_rows"))
        .alias("avg_acctbal"),
        (est("ret_hll").cast("double")
         / F.nullif(est("cust_hll"), F.lit(0))).alias("return_rate"),
        est("funded_hll").alias("funded_customers"),
        (F.col("n_rows").cast("double")
         / F.nullif(est("part_hll"), F.lit(0))).alias("avg_lines_per_part"),
    )


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
