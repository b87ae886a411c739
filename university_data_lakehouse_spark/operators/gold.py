"""Gold-layer analytics models.

Reference parity: the three Trino models in
``defs/gold_analytics/defs.yaml`` (enrollment_metrics l.24,
financial_aid_analytics l.63, admissions_funnel l.100), executed by
``components/gold_analytics_component.py:128``.

Scale notes (SURVEY §6):
- multi-COUNT(DISTINCT) aggregates are left to Catalyst's
  expand + two-phase rewrite (partial aggregation map-side);
- the computed-key LEFT JOIN in gold_revenue_analytics joins against a
  PRE-AGGREGATED per-(year, dept) budget table instead of the raw
  transaction fact — same ratio-of-sums semantics as the reference,
  but fan-out bounded by #departments instead of #transactions, which
  is what survives a 100× scale-up;
- the funnel's global-mode scalar subquery is computed once on a tiny
  aggregate and broadcast-cross-joined (1 row), never per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.joins import broadcast_bounded, maybe_broadcast
from ..functions.money import DEC
from ..sources.loader import load_table


def gold_order_metrics(spark: SparkSession, sf_dir: str,
                       approx_distinct: bool = False,
                       rsd: float = 0.05) -> DataFrame:
    """enrollment_metrics parity (defs/gold_analytics/defs.yaml:24-40):
    3-key GROUP BY over a 3-way join; COUNT(DISTINCT), decimal-exact
    SUM, fan-out AVG, conditional-distinct ratio (retention_rate
    analog), conditional distinct count, COUNT(*)/COUNT(DISTINCT)
    ratio, NULLIF guards.

    ``approx_distinct=True`` swaps every COUNT(DISTINCT) for
    HyperLogLog++ ``approx_count_distinct`` at relative error ``rsd``
    (SURVEY §6): each distinct becomes a mergeable fixed-size sketch,
    so at 100 TB the multi-distinct expand + two-phase shuffle
    collapses to one pass with map-side partials. The oracle-gated
    default stays exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    cd = (lambda c: F.approx_count_distinct(c, rsd)) if approx_distinct \
        else F.countDistinct
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        maybe_broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    n_cust = cd("o_custkey")
    return (
        joined.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            n_cust.alias("total_customers"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"),
            (
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_acctbal"),
            (
                cd(
                    F.when(F.col("l_returnflag") == "R", F.col("o_custkey"))
                ).cast("double")
                / F.nullif(n_cust, F.lit(0))
            ).alias("return_rate"),
            cd(
                F.when(F.col("c_acctbal") > 0, F.col("o_custkey"))
            ).alias("funded_customers"),
            (
                F.count(F.lit(1)).cast("double")
                / F.nullif(cd("l_partkey"), F.lit(0))
            ).alias("avg_lines_per_part"),
        )
    )


def gold_revenue_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """financial_aid_analytics parity
    (defs/gold_analytics/defs.yaml:63-79): filtered fact × dim join,
    LEFT JOIN on a computed key (ship-year string, parity with
    term = CAST(YEAR(posting_date) AS VARCHAR)), constant column,
    sum-scaling (×0.92), ratio of sums with NULLIF."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    fe = (
        li.where(F.col("l_discount") > 0.05)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.year("l_shipdate").cast("string").alias("ship_year"),
            "l_extendedprice",
            "o_custkey",
        )
    )
    budget = (
        orders.groupBy(
            F.year("o_orderdate").cast("string").alias("yr"),
            F.col("o_orderpriority").alias("dept"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("dept_budget"))
    )
    rev = F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
    return (
        fe.join(maybe_broadcast(cust), fe.o_custkey == cust.c_custkey)
        .join(broadcast_bounded(budget), fe.ship_year == budget.yr, "left")
        .groupBy(
            "ship_year",
            F.col("c_mktsegment").alias("segment"),
            F.col("dept").alias("cost_center_name"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("total_customers"),
            rev.alias("total_offered"),
            (rev * F.lit(0.92)).alias("total_disbursed"),
            (rev / F.count(F.lit(1))).alias("avg_revenue_per_row"),
            (
                rev
                / F.nullif(F.max(F.col("dept_budget")).cast("double"), F.lit(0.0))
            ).alias("budget_utilization"),
        )
        .withColumn("rev_type", F.lit("Combined"))
    )


def gold_status_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """admissions_funnel parity (defs/gold_analytics/defs.yaml:100-119):
    pivot-style conditional counts over a status column, derived
    yield/melt rates with NULLIF, uncorrelated scalar subquery (global
    mode) via broadcast cross join of a 1-row DF, COALESCE group key."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def cnt(status: str) -> F.Column:
        return F.count(F.when(F.col("o_orderstatus") == status, F.lit(1)))

    top_segment = (
        cust.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("c_mktsegment"))
        .limit(1)
        .select(F.col("c_mktsegment").alias("top_segment"))
    )
    funnel = (
        orders.groupBy(
            F.coalesce("o_orderpriority", F.lit("None")).alias("priority")
        )
        .agg(
            cnt("O").alias("open_orders"),
            cnt("F").alias("finished_orders"),
            cnt("P").alias("pending_orders"),
            (cnt("F").cast("double") / F.nullif(F.count(F.lit(1)), F.lit(0))).alias(
                "completion_rate"
            ),
            (
                (cnt("O") - cnt("P")).cast("double")
                / F.nullif(cnt("O"), F.lit(0))
            ).alias("melt_rate"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("expected_revenue"),
        )
        .withColumn("term_code", F.lit("Current"))
    )
    return funnel.crossJoin(broadcast_bounded(top_segment))


QUERIES = {
    "gold_order_metrics": gold_order_metrics,
    "gold_revenue_analytics": gold_revenue_analytics,
    "gold_status_funnel": gold_status_funnel,
}

ORACLES = {
    "gold_order_metrics": """
        SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS order_year,
               c.c_mktsegment AS segment,
               o.o_orderstatus AS status,
               COUNT(DISTINCT o.o_custkey) AS total_customers,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_qty,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) AS avg_acctbal,
               CAST(COUNT(DISTINCT CASE WHEN l.l_returnflag = 'R'
                                        THEN o.o_custkey END) AS DOUBLE)
                   / NULLIF(COUNT(DISTINCT o.o_custkey), 0) AS return_rate,
               COUNT(DISTINCT CASE WHEN c.c_acctbal > 0
                                   THEN o.o_custkey END) AS funded_customers,
               CAST(COUNT(*) AS DOUBLE)
                   / NULLIF(COUNT(DISTINCT l.l_partkey), 0)
                   AS avg_lines_per_part
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    """,
    "gold_revenue_analytics": """
        WITH fe AS (
            SELECT CAST(YEAR(l.l_shipdate) AS VARCHAR) AS ship_year,
                   l.l_extendedprice, o.o_custkey
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_discount > 0.05
        ),
        budget AS (
            SELECT CAST(YEAR(o_orderdate) AS VARCHAR) AS yr,
                   o_orderpriority AS dept,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS dept_budget
            FROM orders GROUP BY 1, 2
        )
        SELECT fe.ship_year,
               c.c_mktsegment AS segment,
               b.dept AS cost_center_name,
               COUNT(DISTINCT fe.o_custkey) AS total_customers,
               CAST(SUM(CAST(fe.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_offered,
               CAST(SUM(CAST(fe.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                   * 0.92 AS total_disbursed,
               CAST(SUM(CAST(fe.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) AS avg_revenue_per_row,
               CAST(SUM(CAST(fe.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                   / NULLIF(CAST(MAX(b.dept_budget) AS DOUBLE), 0.0)
                   AS budget_utilization,
               'Combined' AS rev_type
        FROM fe
        JOIN customer c ON fe.o_custkey = c.c_custkey
        LEFT JOIN budget b ON fe.ship_year = b.yr
        GROUP BY fe.ship_year, c.c_mktsegment, b.dept
    """,
    "gold_status_funnel": """
        SELECT COALESCE(o.o_orderpriority, 'None') AS priority,
               COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END)
                   AS open_orders,
               COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END)
                   AS finished_orders,
               COUNT(CASE WHEN o.o_orderstatus = 'P' THEN 1 END)
                   AS pending_orders,
               CAST(COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END)
                    AS DOUBLE) / NULLIF(COUNT(*), 0) AS completion_rate,
               CAST(COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END)
                    - COUNT(CASE WHEN o.o_orderstatus = 'P' THEN 1 END)
                    AS DOUBLE)
                   / NULLIF(COUNT(CASE WHEN o.o_orderstatus = 'O'
                                       THEN 1 END), 0) AS melt_rate,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS expected_revenue,
               'Current' AS term_code,
               (SELECT c_mktsegment FROM customer
                GROUP BY c_mktsegment
                ORDER BY COUNT(*) DESC, c_mktsegment LIMIT 1) AS top_segment
        FROM orders o
        GROUP BY 1
    """,
}
