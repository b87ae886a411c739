"""Core OLAP operators (engine completeness, SURVEY §2.4).

The reference's capability surface is Trino SQL over a star schema;
these operators prove the same OLAP algebra Spark-first: multi-agg
groupBy, selective multi-way joins, top-N, windowed ranking, ROLLUP
grouping sets, and pivot-style conditional aggregation.

Scale notes (SURVEY §6): filters are expressed on scan columns so
Catalyst pushes them into the parquet reader (PushedFilters);
schema-bounded dims broadcast unconditionally while customer-sized
tables go through the size-gated ``maybe_broadcast``; aggregates are
decimal-exact with map-side partials; top-N uses ORDER BY + LIMIT
which Spark executes as TakeOrdered (per-partition heap, no global
sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.joins import maybe_broadcast
from ..functions.money import DEC, DEC_FACTOR, DEC_FACTOR2, DEC_PRICE
from ..sources.loader import load_table


def _disc_price() -> F.Column:
    """extendedprice × (1-discount) as an exact decimal product."""
    return F.col("l_extendedprice").cast(DEC_PRICE) * (
        1 - F.col("l_discount")
    ).cast(DEC_FACTOR)


def olap_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate groupBy with
    decimal-exact sums; single shuffle on the 2-key group."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _disc_price()
    charge = F.col("l_extendedprice").cast(DEC_PRICE) * (
        (1 - F.col("l_discount")).cast(DEC_FACTOR)
        * (1 + F.col("l_tax")).cast(DEC_FACTOR)
    ).cast(DEC_FACTOR2)
    n = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            # shrink the wide-scale decimal sum to (24,6) — exact, true
            # scale ≤ 6 — so the mantissa stays < 2^53 and both engines'
            # decimal→double conversion is exact-then-correctly-rounded
            F.sum(disc_price).cast("decimal(24,6)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(24,6)").cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / n).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / n).alias("avg_price"),
            (F.sum(F.col("l_discount").cast(DEC)).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def olap_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (adapted to available columns): selective 3-way
    join + group + deterministic top-10. Spark runs LIMIT over sort as
    TakeOrdered — no full global sort at scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    revenue = F.sum(_disc_price()).cast("decimal(24,6)").cast("double")
    return (
        li.where(F.col("l_shipdate") > cutoff)
        .join(orders.where(F.col("o_orderdate") < cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("orderdate"), F.col("orderkey"))
        .limit(10)
    )


def olap_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through dims with the
    customer-nation = supplier-nation co-location constraint; dims
    broadcast, single fact shuffle on l_orderkey."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        SELECT n.n_name AS nation,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(24,4))
                        * CAST(1 - l.l_discount AS DECIMAL(12,6)))
                    AS DECIMAL(24,6)) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """)


def olap_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: scan-heavy filtered aggregate — every predicate
    is scan-column-level so it reaches the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC_PRICE)
                * F.col("l_discount").cast(DEC_FACTOR)
            )
            .cast("decimal(24,6)")
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def olap_top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by total price per customer segment via window
    ranking; deterministic tie-break on orderkey. Rank pushdown: the
    window shuffles once on the partition key."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        orders.join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("rk").alias("rank_in_segment"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("total_price"),
        )
    )


def olap_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year, status) with a grouping-level indicator; group
    keys COALESCEd so subtotal rows are hash-stable across engines."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("string").alias("order_year"),
            F.col("o_orderstatus").alias("status"),
            "o_totalprice",
        )
        .rollup("order_year", "status")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.grouping("order_year") * 2 + F.grouping("status")
            ).cast("int").alias("grouping_lvl"),
        )
        .select(
            F.coalesce("order_year", F.lit("ALL")).alias("order_year"),
            F.coalesce("status", F.lit("ALL")).alias("status"),
            "revenue",
            "n_orders",
            "grouping_lvl",
        )
    )


def olap_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (return_flag, line_status): all four grouping sets in one
    pass — the full-lattice sibling of olap_rollup_revenue (ROLLUP
    emits only the prefix hierarchy; CUBE also emits the
    (ALL, line_status) slice). Catalyst expands the lattice map-side,
    so it is still one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
            "l_extendedprice",
        )
        .cube("return_flag", "line_status")
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.grouping("return_flag") * 2 + F.grouping("line_status")
            ).cast("int").alias("grouping_lvl"),
        )
        .select(
            F.coalesce("return_flag", F.lit("ALL")).alias("return_flag"),
            F.coalesce("line_status", F.lit("ALL")).alias("line_status"),
            "revenue",
            "n_lines",
            "grouping_lvl",
        )
    )


def olap_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form ROLLUP/CUBE are
    shorthands of: exactly the (year), (status), and grand-total
    slices, WITHOUT the (year, status) cross ROLLUP would force.
    Catalyst expands the sets map-side into one aggregation pass
    (single shuffle), same as the rollup/cube operators."""
    for t in ("orders",):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        SELECT COALESCE(CAST(year(o_orderdate) AS STRING), 'ALL')
                   AS order_year,
               COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                    AS DECIMAL(24,6)) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders,
               CAST(GROUPING(year(o_orderdate)) * 2
                    + GROUPING(o_orderstatus) AS INT) AS grouping_lvl
        FROM orders
        GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderstatus), ())
    """)


def olap_market_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation: revenue per order-year ×
    market segment as columns (fixed segment list → static schema,
    single shuffle — same plan shape as the reference funnel's
    CASE-count pivot at defs/gold_analytics/defs.yaml:104)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    joined = orders.join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
    aggs = [
        F.sum(
            F.when(F.col("c_mktsegment") == s, F.col("o_totalprice")).cast(DEC)
        )
        .cast("double")
        .alias(f"rev_{s.lower()}")
        for s in segs
    ]
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(*aggs, F.count(F.lit(1)).alias("n_orders"))
    )


def olap_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative revenue per priority by month: pre-aggregate
    to (priority, month) FIRST — the window then runs over ~#months
    rows per priority instead of the raw fact, so the sort under the
    cumulative sum is trivial at any scale. Decimal-exact: monthly
    sums are exact decimals and the running sum adds a bounded count
    of them, so both engines agree bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            # stay TIMESTAMP: both engines' date_trunc yields one, and
            # a DATE cast maps to different pandas dtypes per engine
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("monthly_dec"))
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "priority",
        "month",
        F.col("monthly_dec").cast("double").alias("monthly_revenue"),
        F.sum("monthly_dec").over(w).cast("double").alias("running_revenue"),
    )


INACTIVE_CUTOFF = "2000-01-01"  # orders span 1995..2001 (TESTDATA.md)


def olap_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no orders since the cutoff
    (churned customers). The date filter is pushed into the orders
    scan BEFORE the anti join; the join shuffles both sides on
    custkey once (or broadcasts the filtered key set when it fits);
    no fan-out, no post-filter."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(INACTIVE_CUTOFF).cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )


def olap_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (p25/p50/p75/p90) of order value per
    priority, via Spark's exact ``percentile`` aggregate (sort-based
    within group). At 100 TB the documented switch is
    ``approx_percentile`` (t-digest sketch, mergeable, single pass) —
    exact here because the oracle gate demands it."""
    orders = load_table(spark, sf_dir, "orders")
    pct = F.expr(
        "percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.9D))"
    )
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            pct.getItem(0).alias("p25"),
            pct.getItem(1).alias("p50"),
            pct.getItem(2).alias("p75"),
            pct.getItem(3).alias("p90"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def olap_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted — no partsupp table, so lineitem plays
    the supply relation): for each qualifying part, the supplier(s)
    whose line offers the MINIMUM extended price — the correlated
    "= (SELECT min(...))" subquery pattern, expressed as a per-part
    min aggregate joined back on (partkey, price). Ties keep all
    suppliers, exactly like Q2.

    Scale shape: one shuffle for the per-part min (map-side partial),
    join-back co-partitioned on the same key (no extra exchange),
    part/supplier/nation dims broadcast."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") % 5 == 0)
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    min_price = (
        li.join(maybe_broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
        .select(F.col("l_partkey").alias("mp_partkey"), "min_price")
    )
    offers = (
        li.join(
            min_price,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select(F.col("l_partkey").alias("partkey"), "l_suppkey", "min_price")
        .distinct()
    )
    return (
        offers.join(maybe_broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "partkey",
            F.col("p_name").alias("part_name"),
            F.col("p_brand").alias("brand"),
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("nation"),
            F.col("s_acctbal").alias("supplier_acctbal"),
            "min_price",
        )
    )


# synthetic testdata nation names; NATION_3 is in EUROPE
# (regionkey 3), so the numerator is genuinely non-zero
MARKET_NATION = "NATION_3"
MARKET_REGION = "EUROPE"


def olap_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share within its region
    per order year — ratio of a conditional decimal sum over the
    total, both exact, divided in double. Dims broadcast; the fact
    shuffles once on the join key; the share is computed in the same
    single aggregation pass (no second scan for the denominator)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    disc = _disc_price()
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == MARKET_REGION)),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    # conditional sum via null-else WHEN (SUM skips nulls) — identical
    # CASE semantics in DuckDB; a year with zero nation revenue
    # coalesces to 0.0 in both engines
    nation_rev = F.coalesce(
        F.sum(F.when(F.col("n_name") == MARKET_NATION, disc))
        .cast("decimal(24,6)").cast("double"),
        F.lit(0.0),
    )
    total_rev = F.sum(disc).cast("decimal(24,6)").cast("double")
    return (
        joined.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            nation_rev.alias("nation_revenue"),
            total_rev.alias("total_revenue"),
            (nation_rev / total_rev).alias("market_share"),
        )
    )


def olap_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery as a LEFT SEMI join
    — count orders per priority having AT LEAST ONE lineitem shipped
    more than 30 days after the order date. The semi join never
    duplicates orders (no post-join distinct needed) and shuffles
    both sides once on the orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    return (
        orders.join(li, late, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
    )


PROSPECT_CUTOFF = "2000-01-01"


def olap_prospect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and NO
    orders since the cutoff (lapsed high-value prospects) per segment
    — an uncorrelated scalar subquery (global mean over positive
    balances, computed once on a 1-row aggregate and broadcast-cross-
    joined, never per row) plus a NOT EXISTS expressed as LEFT ANTI
    against the date-filtered orders (filter pushed into the scan
    BEFORE the anti join). The mean is a decimal-exact sum ÷ exact
    count in double, so the threshold is bit-identical in both
    engines."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(PROSPECT_CUTOFF).cast("timestamp"))
    mean_bal = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg((F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
              / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        cust.crossJoin(F.broadcast(mean_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_prospects"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            .alias("total_balance"),
        )
    )


# testdata nations are synthetic NATION_0..24 (regions keep real
# names); pick two high-volume nations so the bilateral filter
# selects real rows
TRADE_NATION_A, TRADE_NATION_B = "NATION_11", "NATION_20"


def olap_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue shipped
    between two nations (either direction) per year. The fact joins
    BOTH the customer-side and the supplier-side nation dims (two
    broadcast joins of the same 25-row table under different aliases);
    the direction filter applies before the aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n_cust = nation.select(F.col("n_nationkey").alias("cn_key"),
                           F.col("n_name").alias("cust_nation"))
    n_supp = nation.select(F.col("n_nationkey").alias("sn_key"),
                           F.col("n_name").alias("supp_nation"))
    pair = (
        ((F.col("cust_nation") == TRADE_NATION_A)
         & (F.col("supp_nation") == TRADE_NATION_B))
        | ((F.col("cust_nation") == TRADE_NATION_B)
           & (F.col("supp_nation") == TRADE_NATION_A))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .where(pair)
        .groupBy("cust_nation", "supp_nation",
                 F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(_disc_price()).cast("decimal(24,6)").cast("double")
             .alias("trade_volume"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


def olap_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING zero-order customers (LEFT JOIN, count of non-null
    keys). Two shuffles — custkey for the per-customer count, then
    the tiny count-histogram aggregation — both with map-side
    partials."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))  # count skips nulls
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


RETURNED_FROM, RETURNED_TO = "1997-01-01", "1997-04-01"


def olap_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer in
    one quarter — filtered fact join + 4-key group + deterministic
    top-20 (ORDER BY exact-decimal revenue DESC, custkey — Spark
    executes LIMIT-over-sort as TakeOrdered, a per-partition heap).
    Both date and returnflag filters push into the parquet scans."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(RETURNED_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(RETURNED_TO).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(_disc_price()).cast("decimal(24,6)").cast("double")
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("custkey"))
        .limit(20)
    )


PROMO_FROM, PROMO_TO = "1997-01-01", "1997-02-01"


def olap_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share in one ship month —
    conditional-vs-total decimal-sum ratio in ONE aggregation pass
    over the filtered fact; the part dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(PROMO_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(PROMO_TO).cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = _disc_price()
    promo = (
        F.sum(F.when(F.col("p_type") == "PROMO", disc))
        .cast("decimal(24,6)").cast("double")
    )
    total = F.sum(disc).cast("decimal(24,6)").cast("double")
    return (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.coalesce(promo, F.lit(0.0)).alias("promo_revenue"),
            total.alias("total_revenue"),
            (F.lit(100.0) * F.coalesce(promo, F.lit(0.0)) / total)
            .alias("promo_pct"),
        )
    )


AVG_YEARLY_BRAND = "Brand#1"
AVG_YEARLY_YEARS = 7.0          # orders span 1995-2001


def olap_avg_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue from small-quantity
    orders of one brand — the correlated "< 0.2 * (SELECT AVG ...)"
    subquery as a per-part mean aggregate joined back on partkey. The
    mean is an explicit sum/count division (identical expression both
    engines — quantity is integer-valued, so sum and count are exact
    and the IEEE division is bit-deterministic). One shuffle for the
    per-part stats, join-back co-partitioned on the same key."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand") == AVG_YEARLY_BRAND)
    li = load_table(spark, sf_dir, "lineitem")
    li_brand = li.join(maybe_broadcast(part.select("p_partkey")),
                       F.col("l_partkey") == F.col("p_partkey"))
    stats = (
        li_brand.groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg((F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"))
    )
    small = li_brand.join(
        stats,
        (F.col("l_partkey") == F.col("ap_partkey"))
        & (F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty")),
    )
    return small.agg(
        (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
         / F.lit(AVG_YEARLY_YEARS)).alias("avg_yearly")
    )


BIG_ORDER_QTY = 150


def olap_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — GROUP BY orderkey
    HAVING SUM(quantity) > threshold, joined back to orders and
    customers. The having-aggregate and the join-back share the
    orderkey shuffle; the customer dim goes through the size-gated
    broadcast. Quantities are integer-valued doubles, so the HAVING
    comparison is exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > BIG_ORDER_QTY)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_name").alias("customer_name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
    )


PROFIT_NAME_PART = "gear"     # p_name is "adjective noun" in testdata
PROFIT_COST_FACTOR = 0.5      # supply-cost analog (no partsupp table)


def olap_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted — no partsupp, so the supply cost is a
    fixed fraction of p_retailprice): profit per (supplier nation,
    order year) for parts matching a name substring. Revenue and cost
    accumulate as SEPARATE exact decimal sums in ONE aggregation pass;
    the subtraction happens once per output row in double (both
    engines convert the exact decimals identically, and ×0.5 is an
    exponent shift — bit-exact). Part/supplier/nation dims broadcast;
    the fact shuffles once for the orderkey join + once for the
    2-key group."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains(PROFIT_NAME_PART))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    cost = F.col("p_retailprice").cast("decimal(18,4)") * (
        F.col("l_quantity").cast("decimal(18,4)"))
    return (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            # cost's true scale is ≤ 4 (retailprice rounded to 4dp ×
            # integer qty), so the (24,4) shrink is EXACT and keeps the
            # mantissa < 2^53 for an exact decimal→double conversion
            (F.sum(_disc_price()).cast("decimal(24,6)").cast("double")
             - F.lit(PROFIT_COST_FACTOR)
             * F.sum(cost).cast("decimal(24,4)").cast("double"))
            .alias("profit")
        )
    )


# NATION_8 has suppliers at every test scale factor (sf0.001 carries
# only 10 suppliers total, so most nations are empty there)
IMPORTANT_NATION = "NATION_8"
IMPORTANT_FRACTION = 0.001


def olap_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted): per-part stock value from one
    nation's suppliers, keeping parts whose value exceeds a FRACTION
    of the grand total — the grouped-HAVING-against-global-aggregate
    pattern. The total is a 1-row re-aggregation of the per-part sums
    (no second fact scan) broadcast-cross-joined back; the threshold
    compare happens in double on identically-converted exact decimals.
    Supplier/nation sides broadcast; one fact shuffle on partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == IMPORTANT_NATION)
    part = load_table(spark, sf_dir, "part")
    per_part = (
        li.join(maybe_broadcast(
            supp.join(F.broadcast(nation),
                      F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_disc_price()).cast("decimal(24,6)").alias("value_dec"))
    )
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_dec").cast("double")
               > F.lit(IMPORTANT_FRACTION) * F.col("total_dec").cast("double"))
        .join(maybe_broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .select(
            "partkey",
            F.col("p_name").alias("part_name"),
            F.col("value_dec").cast("double").alias("stock_value"),
        )
    )


SHIPMODE_LATE_DAYS = 60
HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def olap_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted — no l_shipmode/commitdate, so
    returnflag plays the mode and "late" is shipped > 60 days after
    the order date): per class, how many LATE lines belong to
    high- vs low-priority orders — dual conditional counts in one
    aggregation pass. The lateness predicate is a pure column-level
    comparison evaluated join-side (no fan-out); one orderkey shuffle
    + one tiny group."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > (
        F.col("o_orderdate") + F.expr(f"INTERVAL {SHIPMODE_LATE_DAYS} DAYS"))
    high = F.col("o_orderpriority").isin(*HIGH_PRIORITIES)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(late)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
        )
    )


TOP_SUPP_FROM, TOP_SUPP_TO = "1997-01-01", "1997-04-01"


def olap_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with MAXIMUM revenue in one
    ship quarter — the view-then-max-subquery pattern as a per-supplier
    decimal aggregate, a 1-row max re-aggregation broadcast back, and
    an EXACT decimal equality keeping ties (no double rounding in the
    compare). One fact shuffle on suppkey; supplier dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(TOP_SUPP_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(TOP_SUPP_TO).cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_disc_price()).cast("decimal(24,6)").alias("rev_dec"))
    )
    mx = rev.agg(F.max("rev_dec").alias("max_dec"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev_dec") == F.col("max_dec"))
        .join(maybe_broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "suppkey",
            F.col("s_name").alias("supplier_name"),
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


SUPPLIER_CNT_SIZES = (1, 4, 9, 16, 25, 36, 49)


def olap_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted — lineitem plays partsupp; the
    "customer complaints" exclusion becomes negative-balance
    suppliers): distinct supplier count per (brand, type, size) for
    qualifying parts, excluding blacklisted suppliers via LEFT ANTI
    (the NOT IN). The anti join's right side is a handful of keys —
    broadcast; countDistinct expands to a two-shuffle
    distinct-then-count, both with partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*SUPPLIER_CNT_SIZES)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def olap_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a DISJUNCTION of conjunctive
    brand/quantity/size branches spanning both join sides. Catalyst
    extracts the common join key and pushes the part-only predicate
    disjuncts into the broadcast side's scan; the final OR evaluates
    join-side in one pass — no union-of-three-scans rewrite needed."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    branch = (
        ((F.col("p_brand") == "Brand#1") & qty.between(1, 15)
         & size.between(1, 10))
        | ((F.col("p_brand") == "Brand#2") & qty.between(10, 25)
           & size.between(1, 20))
        | ((F.col("p_brand") == "Brand#3") & qty.between(20, 35)
           & size.between(1, 30))
    )
    return (
        li.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg(
            F.sum(_disc_price()).cast("decimal(24,6)").cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


EXCESS_NAME_PREFIX = "red"
EXCESS_QTY = 60
EXCESS_REGIONKEY = 2


def olap_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted — shipped quantity plays availqty):
    suppliers in one region who moved MORE than a threshold quantity
    of some name-prefixed part — the nested IN-subquery chain as
    aggregate → distinct keys → join against the dim side. The
    (suppkey, partkey) HAVING aggregate shuffles the part-filtered
    fact once; the surviving key set is tiny and broadcasts into the
    supplier join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith(EXCESS_NAME_PREFIX))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_regionkey") == EXCESS_REGIONKEY)
    heavy = (
        li.join(maybe_broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > EXCESS_QTY)
        .select(F.col("l_suppkey").alias("hv_suppkey"))
        .distinct()
    )
    return (
        supp.join(F.broadcast(heavy),
                  F.col("s_suppkey") == F.col("hv_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("nation"),
        )
    )


WAITING_LATE_DAYS = 180


def olap_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    failed multi-supplier orders. The EXISTS (another supplier) and
    NOT EXISTS (another late supplier) correlated subqueries collapse
    into ONE grouped pass per order — distinct supplier count, distinct
    late-supplier count, and (since exactly one survives the filter) a
    MAX to recover that supplier's key — instead of two extra
    self-joins of the fact. One orderkey shuffle + one suppkey group;
    supplier/nation dims broadcast. All-integer logic: exact in both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    late_supp = F.when(
        F.col("l_shipdate") > F.col("o_orderdate")
        + F.expr(f"INTERVAL {WAITING_LATE_DAYS} DAYS"),
        F.col("l_suppkey"),
    )
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(late_supp).alias("n_late"),
            F.max(late_supp).alias("late_supp"),
        )
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        per_order.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(maybe_broadcast(supp), F.col("late_supp") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_name").alias("supplier_name"),
            F.col("n_name").alias("nation"),
            "numwait",
        )
    )


def olap_revenue_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the lag-on-aggregate BI
    pattern (olap_running_revenue covers the cumulative frame; this
    covers the offset frame). Pre-aggregate to months FIRST, so the
    lag window sorts ~#months rows, not the fact. Monthly sums are
    decimal-exact; the growth ratio divides a decimal-exact delta by
    a decimal-exact base after ONE cast each, so both engines divide
    identical doubles."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("monthly_dec"))
    w = Window.orderBy("month")
    prev = F.lag("monthly_dec").over(w)
    return monthly.select(
        "month",
        F.col("monthly_dec").cast("double").alias("monthly_revenue"),
        prev.cast("double").alias("prev_month_revenue"),
        (
            (F.col("monthly_dec") - prev).cast("double")
            / prev.cast("double")
        ).alias("mom_growth"),
    )


def olap_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer repeat rate: of the customers active in
    year Y, how many came back in Y+1 — the INTERSECT-shaped cohort
    statistic (set overlap between adjacent activity years). The
    distinct (custkey, year) projection collapses the fact to at most
    |customers|×|years| rows before any join; the self-join on
    (custkey, year+1) is then distinct-on-both-sides (≤1 match), so
    counting matches counts the intersection. One shuffle for the
    distinct, one co-partitioned self-join, final agg is year-sized."""
    orders = load_table(spark, sf_dir, "orders")
    ay = orders.select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).distinct()
    nxt = ay.select(
        F.col("o_custkey").alias("n_custkey"),
        (F.col("yr") - 1).alias("n_prev_yr"),
    )
    joined = ay.join(
        nxt,
        (F.col("o_custkey") == F.col("n_custkey"))
        & (F.col("yr") == F.col("n_prev_yr")),
        "left",
    )
    return (
        joined.groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count("n_custkey").alias("n_repeat"),
        )
        .select(
            F.col("yr").alias("order_year"),
            "n_active",
            "n_repeat",
            (
                F.col("n_repeat").cast("double")
                / F.col("n_active").cast("double")
            ).alias("repeat_rate"),
        )
    )


ABC_A_CUT = 0.80   # A-class: customers covering the first 80% of revenue
ABC_B_CUT = 0.95   # B-class: the next 15%


ABC_BANDS = 32  # approx-quantile revenue cuts for the banded path


def abc_band_column(expr: F.Column, cuts: list) -> F.Column:
    """CASE chain mapping a value to its revenue band (0 = highest
    values). ``cuts`` must be sorted DESCENDING; the chain is built
    reversed so the LARGEST cut is the outermost ``when`` branch —
    CASE stops at the first true condition, so a smallest-cut-first
    chain would send every value >= cuts[-1] into one band and
    collapse the banding (the r7 defect)."""
    band = F.lit(len(cuts))
    for i, c in reversed(list(enumerate(cuts))):
        band = F.when(expr >= F.lit(c), F.lit(i)).otherwise(band)
    return band


def olap_customer_abc(spark: SparkSession, sf_dir: str,
                      banded: bool = False,
                      n_bands: int = ABC_BANDS) -> DataFrame:
    """Pareto / ABC customer classification — the 80/15/5 revenue
    concentration report: customers rank by lifetime revenue and
    class A covers the first 80% of cumulative revenue, B the next
    15%, C the tail. The fact collapses to one row per customer
    BEFORE any window; the cumulative share then runs over the
    customers-sized aggregate under a compound total order
    (revenue desc, custkey). Revenue and the running sum are
    decimal-exact; the share divides two exact decimals once, so the
    class thresholds compare identical doubles in both engines.

    ``banded=True`` is the 100 TB path: approx-quantile revenue cuts
    split customers into ``n_bands`` value bands; the cumulative sum
    is then a per-BAND window (bounded partitions) plus a prefix
    offset from the bands-sized totals table (n_bands rows). Because
    bands partition the *value* range and decimal addition is
    associative, offset + in-band running sum EQUALS the global
    running sum bit-for-bit — the banded path is exact, only the
    band balance is approximate (test_approx_switches pins equality
    against the default path)."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    total = per_cust.agg(F.sum("rev_dec").alias("total_dec"))
    if banded:
        probs = [i / n_bands for i in range(1, n_bands)]
        cuts = sorted(set(
            per_cust.withColumn("_rev_d", F.col("rev_dec").cast("double"))
            .stat.approxQuantile("_rev_d", probs, 0.001)
        ), reverse=True)
        # band 0 = highest-revenue values; equal revenues always land
        # in the same band, so in-band order (rev desc, custkey) is the
        # global order restricted to the band.
        banded_df = per_cust.withColumn(
            "_band", abc_band_column(F.col("rev_dec").cast("double"), cuts))
        w_in = (
            Window.partitionBy("_band")
            .orderBy(F.col("rev_dec").desc(), F.col("o_custkey"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        band_tot = banded_df.groupBy("_band").agg(
            F.sum("rev_dec").alias("_band_sum"))
        w_prefix = (
            Window.orderBy("_band")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = band_tot.select(
            "_band",
            F.coalesce(
                F.sum("_band_sum").over(w_prefix),
                F.lit(0).cast("decimal(38,4)"),
            ).alias("_offset_dec"),
        )
        cum = F.col("_offset_dec") + F.sum("rev_dec").over(w_in)
        with_cum = (
            banded_df.join(F.broadcast(offsets), "_band")
            .withColumn("_cum_dec", cum)
        )
        cum_share = (F.col("_cum_dec").cast("double")
                     / F.col("total_dec").cast("double"))
        body = with_cum
    else:
        w = Window.orderBy(F.col("rev_dec").desc(), F.col("o_custkey"))
        cum_share = (
            F.sum("rev_dec").over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))
            .cast("double") / F.col("total_dec").cast("double")
        )
        body = per_cust
    return (
        body.crossJoin(F.broadcast(total))
        .select(
            F.col("o_custkey").alias("custkey"),
            "n_orders",
            F.col("rev_dec").cast("double").alias("revenue"),
            cum_share.alias("cum_revenue_share"),
        )
        .withColumn(
            "abc_class",
            F.when(F.col("cum_revenue_share") <= ABC_A_CUT, "A")
            .when(F.col("cum_revenue_share") <= ABC_B_CUT, "B")
            .otherwise("C"),
        )
    )


def olap_customer_abc_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable registration of the 100 TB scale switch
    ``olap_customer_abc(banded=True)`` (VERDICT r7 item 4): banding
    only changes the window PARTITIONING — band offsets + in-band
    decimal running sums equal the global running sum bit-for-bit —
    so this key shares ``olap_customer_abc``'s DuckDB oracle and its
    driver row is a hard correctness gate on the banded plan."""
    return olap_customer_abc(spark, sf_dir, banded=True)


BASKET_TOP_K = 50       # co-occurrence pairs surfaced
BASKET_MAX_LINES = 200  # drop baskets with more distinct parts: a
# mega-basket (wholesale order, bot cart) contributes C(n,2) pairs
# through ONE join key — the r7 skew bench measured a single planted
# 10k-part order at 10.7x total runtime — while carrying no affinity
# signal (every pair's support is diluted by the basket's size).
# Standard market-basket practice caps basket size; the cap bounds
# the per-key fan-out at C(200,2) ~ 20k pairs.


def olap_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity — the association-mining statistic
    (which parts ship together, with what lift over independence)
    behind recommendations and assortment planning. The fact
    collapses to one BASKET ROW per order (groupBy(l_orderkey) +
    sort_array(collect_set(l_partkey)) — the set dedups, the sort
    pins determinism); pair generation is then an IN-ROW double
    explode with pa < pb, fan-out C(parts, 2) bounded by the basket
    cap — a per-order constant, never corpus-quadratic, and NO join.
    r12 rewrite: the previous form (distinct → window cap →
    co-partitioned self-join) shuffled the fact three times and its
    sf10 timing drifted 36→52s across rounds on untouched code; the
    basket form shuffles it ONCE into order-grained baskets that
    pairs / per-part counts / the order count all derive from
    narrowly (14 exchanges → 8 in the formatted plan; sf10 best-case
    46s → 30s same-session). At 100 TB the single fact shuffle is
    the floor any grouping needs, and partial collect_set absorbs a
    hot order map-side before the exchange (skew bench pins this).

    Pair counts, per-part order counts, and the global order count
    are all exact integers; support and lift divide them once, so
    both engines emit identical doubles. Top-K by (pair count desc,
    part keys) on the aggregated pairs table via a distributed
    TakeOrdered (orderBy+limit — per-partition partial top-K merged
    on the driver), NOT an unpartitioned rank window: the pairs
    table is the one unbounded table here (distinct co-occurring
    part pairs), and a global row_number would funnel it through a
    single task. pair_rank derives from row_number only AFTER the
    K-row cut, where a one-task window is K rows.

    Baskets with more than ``BASKET_MAX_LINES`` distinct parts are
    dropped BEFORE pair generation (and from the support/lift
    denominators, so all statistics describe the same capped
    universe).

    Buffer-bound decision (ADVICE r12, weighed and declined): the
    size cap is applied AFTER collect_set materializes a basket, so
    a degenerate order buffers its full distinct-part array before
    being dropped. Pre-filtering oversized orders needs the count
    BEFORE the collect — that is two extra fact-scale shuffles
    (dedup pairs → per-order count → join back) on EVERY run, and it
    breaks the single-fact-shuffle plan this r12 rewrite exists for
    (pinned by tests/test_plan_shape.py). The unguarded buffer is
    physically bounded: collect_set dedups in the map-side partial,
    so a basket buffers at most min(order's lines, |part| dimension)
    longs — the planted-skew 10k-line order is an 80 KB buffer,
    measured absorbed map-side in the skew bench. An order would
    need ~100M DISTINCT parts to pressure an executor, which is a
    part-dimension-sized order, not a plausible fact row group; if
    such a source existed, the count→filter→collect shape above is
    the known mitigation to swap in."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .where(F.size("parts") <= BASKET_MAX_LINES)
    )
    pairs = (
        baskets.select(F.explode("parts").alias("pa"), "parts")
        .select("pa", F.explode("parts").alias("pb"))
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    per_part = (
        baskets.select(F.explode("parts").alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n_part"))
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    topk = (
        pairs.orderBy(F.col("n_both").desc(), F.col("pa"), F.col("pb"))
        .limit(BASKET_TOP_K)
    )
    w = Window.orderBy(F.col("n_both").desc(), F.col("pa"), F.col("pb"))
    ranked = topk.withColumn("pair_rank", F.row_number().over(w))
    pa_cnt = per_part.select(F.col("pk").alias("pa"),
                             F.col("n_part").alias("n_a"))
    pb_cnt = per_part.select(F.col("pk").alias("pb"),
                             F.col("n_part").alias("n_b"))
    return (
        ranked.join(maybe_broadcast(pa_cnt), "pa")
        .join(maybe_broadcast(pb_cnt), "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pair_rank", "pa", "pb", "n_both", "n_a", "n_b",
            (
                F.col("n_both").cast("double")
                / F.col("n_orders").cast("double")
            ).alias("support"),
            (
                (F.col("n_both").cast("double")
                 * F.col("n_orders").cast("double"))
                / (F.col("n_a").cast("double")
                   * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


QUERIES = {
    "olap_basket_affinity": olap_basket_affinity,
    "olap_customer_abc": olap_customer_abc,
    "olap_customer_abc_banded": olap_customer_abc_banded,
    "olap_revenue_mom": olap_revenue_mom,
    "olap_repeat_customers": olap_repeat_customers,
    "olap_pricing_summary": olap_pricing_summary,
    "olap_late_orders": olap_late_orders,
    "olap_shipping_priority": olap_shipping_priority,
    "olap_local_supplier_volume": olap_local_supplier_volume,
    "olap_revenue_forecast": olap_revenue_forecast,
    "olap_top_k_per_group": olap_top_k_per_group,
    "olap_rollup_revenue": olap_rollup_revenue,
    "olap_cube_revenue": olap_cube_revenue,
    "olap_grouping_sets": olap_grouping_sets,
    "olap_market_pivot": olap_market_pivot,
    "olap_running_revenue": olap_running_revenue,
    "olap_inactive_customers": olap_inactive_customers,
    "olap_price_percentiles": olap_price_percentiles,
    "olap_min_cost_supplier": olap_min_cost_supplier,
    "olap_market_share": olap_market_share,
    "olap_nation_trade": olap_nation_trade,
    "olap_prospect_customers": olap_prospect_customers,
    "olap_customer_distribution": olap_customer_distribution,
    "olap_returned_items": olap_returned_items,
    "olap_promo_revenue": olap_promo_revenue,
    "olap_avg_yearly": olap_avg_yearly,
    "olap_big_orders": olap_big_orders,
    "olap_profit_by_nation": olap_profit_by_nation,
    "olap_important_parts": olap_important_parts,
    "olap_priority_shipmode": olap_priority_shipmode,
    "olap_top_supplier": olap_top_supplier,
    "olap_supplier_part_counts": olap_supplier_part_counts,
    "olap_disjunctive_revenue": olap_disjunctive_revenue,
    "olap_excess_suppliers": olap_excess_suppliers,
    "olap_waiting_suppliers": olap_waiting_suppliers,
}

_DISC_SQL = ("CAST(l_extendedprice AS DECIMAL(24,4))"
             " * CAST(1 - l_discount AS DECIMAL(12,6))")

ORACLES = {
    "olap_basket_affinity": f"""
        WITH op0 AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        op AS (
            SELECT l_orderkey, l_partkey FROM (
                SELECT l_orderkey, l_partkey,
                       COUNT(*) OVER (PARTITION BY l_orderkey)
                           AS _n_lines
                FROM op0)
            WHERE _n_lines <= {BASKET_MAX_LINES}
        ),
        pairs AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                   COUNT(*) AS n_both
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ),
        pp AS (
            SELECT l_partkey AS pk, COUNT(*) AS n_part FROM op GROUP BY 1
        ),
        n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
        ranked AS (
            SELECT pa, pb, n_both,
                   CAST(ROW_NUMBER() OVER (
                        ORDER BY n_both DESC, pa, pb) AS INTEGER)
                       AS pair_rank
            FROM pairs
        )
        SELECT pair_rank, pa, pb, n_both,
               ca.n_part AS n_a, cb.n_part AS n_b,
               CAST(n_both AS DOUBLE) / CAST(n.n_orders AS DOUBLE)
                   AS support,
               (CAST(n_both AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
                   / (CAST(ca.n_part AS DOUBLE)
                      * CAST(cb.n_part AS DOUBLE)) AS lift
        FROM ranked
        JOIN pp ca ON ca.pk = ranked.pa
        JOIN pp cb ON cb.pk = ranked.pb
        CROSS JOIN n
        WHERE pair_rank <= {BASKET_TOP_K}
    """,
    "olap_customer_abc": f"""
        WITH pc AS (
            SELECT o_custkey AS custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        ),
        tot AS (SELECT SUM(rev_dec) AS total_dec FROM pc),
        shares AS (
            SELECT custkey, n_orders,
                   CAST(rev_dec AS DOUBLE) AS revenue,
                   CAST(SUM(rev_dec) OVER (
                        ORDER BY rev_dec DESC, custkey
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                       / CAST(total_dec AS DOUBLE) AS cum_revenue_share
            FROM pc CROSS JOIN tot
        )
        SELECT custkey, n_orders, revenue, cum_revenue_share,
               CASE WHEN cum_revenue_share <= {ABC_A_CUT} THEN 'A'
                    WHEN cum_revenue_share <= {ABC_B_CUT} THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM shares
    """,
    "olap_revenue_mom": """
        WITH m AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monthly_dec
            FROM orders GROUP BY 1
        )
        SELECT month,
               CAST(monthly_dec AS DOUBLE) AS monthly_revenue,
               CAST(LAG(monthly_dec) OVER (ORDER BY month) AS DOUBLE)
                   AS prev_month_revenue,
               CAST(monthly_dec - LAG(monthly_dec) OVER (ORDER BY month)
                    AS DOUBLE)
                   / CAST(LAG(monthly_dec) OVER (ORDER BY month) AS DOUBLE)
                   AS mom_growth
        FROM m
    """,
    "olap_repeat_customers": """
        WITH ay AS (
            SELECT DISTINCT o_custkey, year(o_orderdate) AS yr
            FROM orders
        )
        SELECT a.yr AS order_year,
               COUNT(*) AS n_active,
               COUNT(b.o_custkey) AS n_repeat,
               CAST(COUNT(b.o_custkey) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS repeat_rate
        FROM ay a
        LEFT JOIN ay b ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
        GROUP BY 1
    """,
    "olap_grouping_sets": """
        SELECT COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL')
                   AS order_year,
               COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                    AS DECIMAL(24,6)) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders,
               CAST(GROUPING(year(o_orderdate)) * 2
                    + GROUPING(o_orderstatus) AS INTEGER) AS grouping_lvl
        FROM orders
        GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderstatus), ())
    """,
    "olap_profit_by_nation": f"""
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
               CAST(CAST(SUM({_DISC_SQL}) AS DECIMAL(24,6)) AS DOUBLE)
               - {PROFIT_COST_FACTOR}
                 * CAST(CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,4))
                                 * CAST(l.l_quantity AS DECIMAL(18,4)))
                        AS DECIMAL(24,4)) AS DOUBLE) AS profit
        FROM lineitem l
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%{PROFIT_NAME_PART}%'
        GROUP BY 1, 2
    """,
    "olap_important_parts": f"""
        WITH v AS (
            SELECT l.l_partkey AS partkey,
                   CAST(SUM({_DISC_SQL}) AS DECIMAL(24,6)) AS value_dec
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = '{IMPORTANT_NATION}'
            GROUP BY 1
        ), t AS (SELECT SUM(value_dec) AS total_dec FROM v)
        SELECT v.partkey,
               p.p_name AS part_name,
               CAST(v.value_dec AS DOUBLE) AS stock_value
        FROM v
        CROSS JOIN t
        JOIN part p ON v.partkey = p.p_partkey
        WHERE CAST(v.value_dec AS DOUBLE)
              > {IMPORTANT_FRACTION} * CAST(t.total_dec AS DOUBLE)
    """,
    "olap_priority_shipmode": f"""
        SELECT l.l_returnflag AS ship_class,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate
                             + INTERVAL {SHIPMODE_LATE_DAYS} DAY
        GROUP BY 1
    """,
    "olap_top_supplier": f"""
        WITH r AS (
            SELECT l_suppkey AS suppkey,
                   CAST(SUM({_DISC_SQL}) AS DECIMAL(24,6)) AS rev_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{TOP_SUPP_FROM}'
              AND l_shipdate <  TIMESTAMP '{TOP_SUPP_TO}'
            GROUP BY 1
        ), m AS (SELECT MAX(rev_dec) AS max_dec FROM r)
        SELECT r.suppkey,
               s.s_name AS supplier_name,
               CAST(r.rev_dec AS DOUBLE) AS total_revenue
        FROM r
        CROSS JOIN m
        JOIN supplier s ON r.suppkey = s.s_suppkey
        WHERE r.rev_dec = m.max_dec
    """,
    "olap_supplier_part_counts": f"""
        SELECT p.p_brand AS brand,
               p.p_type AS type,
               p.p_size AS size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN {SUPPLIER_CNT_SIZES}
          AND l.l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "olap_disjunctive_revenue": f"""
        SELECT CAST(CAST(SUM({_DISC_SQL}) AS DECIMAL(24,6)) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 15
               AND p.p_size BETWEEN 1 AND 10)
           OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 25
               AND p.p_size BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 35
               AND p.p_size BETWEEN 1 AND 30)
    """,
    "olap_excess_suppliers": f"""
        WITH heavy AS (
            SELECT DISTINCT l.l_suppkey AS hv_suppkey
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_name LIKE '{EXCESS_NAME_PREFIX}%'
            GROUP BY l.l_suppkey, l.l_partkey
            HAVING SUM(l.l_quantity) > {EXCESS_QTY}
        )
        SELECT s.s_suppkey AS suppkey,
               s.s_name AS supplier_name,
               n.n_name AS nation
        FROM supplier s
        JOIN heavy h  ON s.s_suppkey = h.hv_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_regionkey = {EXCESS_REGIONKEY}
    """,
    "olap_waiting_suppliers": f"""
        WITH per_order AS (
            SELECT l.l_orderkey,
                   COUNT(DISTINCT l.l_suppkey) AS n_supp,
                   COUNT(DISTINCT CASE WHEN l.l_shipdate >
                         o.o_orderdate + INTERVAL {WAITING_LATE_DAYS} DAY
                         THEN l.l_suppkey END) AS n_late,
                   MAX(CASE WHEN l.l_shipdate >
                       o.o_orderdate + INTERVAL {WAITING_LATE_DAYS} DAY
                       THEN l.l_suppkey END) AS late_supp
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
            GROUP BY 1
        )
        SELECT s.s_name AS supplier_name,
               n.n_name AS nation,
               COUNT(*) AS numwait
        FROM per_order p
        JOIN supplier s ON p.late_supp = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.n_supp > 1 AND p.n_late = 1
        GROUP BY 1, 2
    """,
    "olap_prospect_customers": f"""
        WITH m AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) AS avg_bal
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_prospects,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_balance
        FROM customer c, m
        WHERE c.c_acctbal > m.avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '{PROSPECT_CUTOFF}'
          )
        GROUP BY 1
    """,
    "olap_nation_trade": f"""
        SELECT cn.n_name AS cust_nation,
               sn.n_name AS supp_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
               CAST(CAST(SUM({_DISC_SQL}) AS DECIMAL(24,6)) AS DOUBLE)
                   AS trade_volume,
               COUNT(*) AS n_lineitems
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        WHERE (cn.n_name = '{TRADE_NATION_A}'
               AND sn.n_name = '{TRADE_NATION_B}')
           OR (cn.n_name = '{TRADE_NATION_B}'
               AND sn.n_name = '{TRADE_NATION_A}')
        GROUP BY 1, 2, 3
    """,
    "olap_customer_distribution": """
        SELECT n_orders, COUNT(*) AS n_customers
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY 1
        )
        GROUP BY 1
    """,
    "olap_returned_items": f"""
        SELECT c.c_custkey AS custkey,
               c.c_name AS name,
               c.c_acctbal AS acctbal,
               n.n_name AS nation,
               CAST(CAST(SUM({_DISC_SQL}) AS DECIMAL(24,6)) AS DOUBLE)
                   AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '{RETURNED_FROM}'
          AND o.o_orderdate <  TIMESTAMP '{RETURNED_TO}'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, custkey
        LIMIT 20
    """,
    "olap_promo_revenue": f"""
        SELECT COALESCE(CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                        THEN {_DISC_SQL} END)
                    AS DECIMAL(24,6)) AS DOUBLE), 0.0) AS promo_revenue,
               CAST(CAST(SUM({_DISC_SQL}) AS DECIMAL(24,6)) AS DOUBLE)
                   AS total_revenue,
               100.0 * COALESCE(CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                        THEN {_DISC_SQL} END)
                    AS DECIMAL(24,6)) AS DOUBLE), 0.0)
               / CAST(CAST(SUM({_DISC_SQL}) AS DECIMAL(24,6)) AS DOUBLE)
                   AS promo_pct
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '{PROMO_FROM}'
          AND l.l_shipdate <  TIMESTAMP '{PROMO_TO}'
    """,
    "olap_avg_yearly": f"""
        WITH brand_li AS (
            SELECT l.* FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand = '{AVG_YEARLY_BRAND}'
        ),
        stats AS (
            SELECT l_partkey AS ap_partkey,
                   SUM(l_quantity) / COUNT(*) AS avg_qty
            FROM brand_li GROUP BY 1
        )
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                    AS DOUBLE) / {AVG_YEARLY_YEARS} AS avg_yearly
        FROM brand_li l
        JOIN stats s ON l.l_partkey = s.ap_partkey
                    AND l.l_quantity < 0.2 * s.avg_qty
    """,
    "olap_big_orders": f"""
        WITH big AS (
            SELECT l_orderkey, SUM(l_quantity) AS total_qty
            FROM lineitem GROUP BY 1
            HAVING SUM(l_quantity) > {BIG_ORDER_QTY}
        )
        SELECT c.c_name AS customer_name,
               c.c_custkey AS custkey,
               o.o_orderkey AS orderkey,
               o.o_orderdate AS orderdate,
               o.o_totalprice AS totalprice,
               b.total_qty
        FROM big b
        JOIN orders o   ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "olap_late_orders": """
        SELECT o.o_orderpriority AS priority,
               COUNT(*) AS n_late_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        )
        GROUP BY 1
    """,
    "olap_min_cost_supplier": """
        WITH qual AS (SELECT * FROM part WHERE p_size % 5 = 0),
        mins AS (
            SELECT l.l_partkey, MIN(l.l_extendedprice) AS min_price
            FROM lineitem l JOIN qual p ON l.l_partkey = p.p_partkey
            GROUP BY 1
        ),
        offers AS (
            SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey, m.min_price
            FROM lineitem l
            JOIN mins m ON l.l_partkey = m.l_partkey
                       AND l.l_extendedprice = m.min_price
        )
        SELECT o.partkey,
               p.p_name AS part_name,
               p.p_brand AS brand,
               s.s_name AS supplier_name,
               n.n_name AS nation,
               s.s_acctbal AS supplier_acctbal,
               o.min_price
        FROM offers o
        JOIN qual p ON o.partkey = p.p_partkey
        JOIN supplier s ON o.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    "olap_market_share": """
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
               COALESCE(CAST(CAST(SUM(CASE WHEN n.n_name = 'NATION_3'
                        THEN CAST(l.l_extendedprice AS DECIMAL(24,4))
                             * CAST(1 - l.l_discount AS DECIMAL(12,6)) END)
                    AS DECIMAL(24,6)) AS DOUBLE), 0.0) AS nation_revenue,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(24,4))
                        * CAST(1 - l.l_discount AS DECIMAL(12,6)))
                    AS DECIMAL(24,6)) AS DOUBLE) AS total_revenue,
               COALESCE(CAST(CAST(SUM(CASE WHEN n.n_name = 'NATION_3'
                        THEN CAST(l.l_extendedprice AS DECIMAL(24,4))
                             * CAST(1 - l.l_discount AS DECIMAL(12,6)) END)
                    AS DECIMAL(24,6)) AS DOUBLE), 0.0)
               / CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(24,4))
                        * CAST(1 - l.l_discount AS DECIMAL(12,6)))
                    AS DECIMAL(24,6)) AS DOUBLE) AS market_share
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY 1
    """,
    "olap_pricing_summary": """
        SELECT l_returnflag AS return_flag,
               l_linestatus AS line_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                        * CAST(1 - l_discount AS DECIMAL(12,6)))
                    AS DECIMAL(24,6)) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                        * CAST(CAST(1 - l_discount AS DECIMAL(12,6))
                               * CAST(1 + l_tax AS DECIMAL(12,6))
                               AS DECIMAL(13,12)))
                    AS DECIMAL(24,6)) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "olap_shipping_priority": """
        SELECT l.l_orderkey AS orderkey,
               o.o_orderdate AS orderdate,
               o.o_orderpriority AS priority,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(24,4))
                        * CAST(1 - l.l_discount AS DECIMAL(12,6)))
                    AS DECIMAL(24,6)) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, orderdate, orderkey
        LIMIT 10
    """,
    "olap_local_supplier_volume": """
        SELECT n.n_name AS nation,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(24,4))
                        * CAST(1 - l.l_discount AS DECIMAL(12,6)))
                    AS DECIMAL(24,6)) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    "olap_revenue_forecast": """
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,4))
                        * CAST(l_discount AS DECIMAL(12,6)))
                    AS DECIMAL(24,6)) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "olap_top_k_per_group": """
        SELECT segment, rank_in_segment, orderkey, total_price FROM (
            SELECT c.c_mktsegment AS segment,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.c_mktsegment
                       ORDER BY o.o_totalprice DESC, o.o_orderkey
                   ) AS rank_in_segment,
                   o.o_orderkey AS orderkey,
                   o.o_totalprice AS total_price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ) WHERE rank_in_segment <= 3
    """,
    "olap_rollup_revenue": """
        SELECT COALESCE(CAST(YEAR(o_orderdate) AS VARCHAR), 'ALL') AS order_year,
               COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders,
               CAST(GROUPING(CAST(YEAR(o_orderdate) AS VARCHAR)) * 2
                    + GROUPING(o_orderstatus) AS INTEGER) AS grouping_lvl
        FROM orders
        GROUP BY ROLLUP (CAST(YEAR(o_orderdate) AS VARCHAR), o_orderstatus)
    """,
    "olap_cube_revenue": """
        SELECT COALESCE(l_returnflag, 'ALL') AS return_flag,
               COALESCE(l_linestatus, 'ALL') AS line_status,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n_lines,
               CAST(GROUPING(l_returnflag) * 2
                    + GROUPING(l_linestatus) AS INTEGER) AS grouping_lvl
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "olap_running_revenue": """
        WITH monthly AS (
            SELECT o_orderpriority AS priority,
                   date_trunc('month', o_orderdate) AS month,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monthly_dec
            FROM orders GROUP BY 1, 2
        )
        SELECT priority, month,
               CAST(monthly_dec AS DOUBLE) AS monthly_revenue,
               CAST(SUM(monthly_dec) OVER (
                   PARTITION BY priority ORDER BY month
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_revenue
        FROM monthly
    """,
    "olap_inactive_customers": f"""
        SELECT c.c_custkey AS custkey, c.c_name AS name,
               c.c_mktsegment AS segment, c.c_acctbal AS acctbal
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '{INACTIVE_CUTOFF} 00:00:00'
        )
    """,
    "olap_price_percentiles": """
        SELECT o_orderpriority AS priority,
               quantile_cont(o_totalprice, 0.25) AS p25,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.75) AS p75,
               quantile_cont(o_totalprice, 0.9) AS p90,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "olap_market_pivot": """
        SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS order_year,
               CAST(SUM(CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
                   THEN CAST(o.o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_automobile,
               CAST(SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
                   THEN CAST(o.o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_building,
               CAST(SUM(CASE WHEN c.c_mktsegment = 'FURNITURE'
                   THEN CAST(o.o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_furniture,
               CAST(SUM(CASE WHEN c.c_mktsegment = 'HOUSEHOLD'
                   THEN CAST(o.o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_household,
               CAST(SUM(CASE WHEN c.c_mktsegment = 'MACHINERY'
                   THEN CAST(o.o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_machinery,
               COUNT(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    """,
}

# The banded scale switch is bit-exact against the SAME oracle — the
# band prefix-offset decomposition is associativity of decimal
# addition, not an approximation (see olap_customer_abc_banded).
ORACLES["olap_customer_abc_banded"] = ORACLES["olap_customer_abc"]
