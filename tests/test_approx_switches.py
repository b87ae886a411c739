"""Scale switches for the two former global-window operators
(VERDICT r6 item 3): olap_customer_abc(banded=True) must equal the
exact path bit-for-bit (banding only changes the window PARTITIONING,
not the decimal arithmetic), and dq_value_outliers(approx=True) must
track the exact Tukey fences within approx_percentile rank error."""

from __future__ import annotations

from university_data_lakehouse_spark.operators.olap import olap_customer_abc
from university_data_lakehouse_spark.operators.quality import dq_value_outliers


def test_customer_abc_banded_is_exact(spark, sf_dir):
    cols = ["custkey", "n_orders", "revenue", "cum_revenue_share",
            "abc_class"]
    exact = {
        r["custkey"]: tuple(r[c] for c in cols)
        for r in olap_customer_abc(spark, sf_dir).collect()
    }
    banded = {
        r["custkey"]: tuple(r[c] for c in cols)
        for r in olap_customer_abc(spark, sf_dir, banded=True).collect()
    }
    assert exact == banded  # bit-exact incl. cumulative shares


def test_customer_abc_banded_few_bands_still_exact(spark, sf_dir):
    """Degenerate banding (2 bands) still partitions the value range —
    equality must not depend on the quantile sketch being balanced."""
    exact = {
        r["custkey"]: r["cum_revenue_share"]
        for r in olap_customer_abc(spark, sf_dir).collect()
    }
    banded = {
        r["custkey"]: r["cum_revenue_share"]
        for r in olap_customer_abc(
            spark, sf_dir, banded=True, n_bands=2).collect()
    }
    assert exact == banded


def test_customer_abc_banded_windows_are_partitioned(spark, sf_dir):
    """The banded plan's customer-sized window must carry a
    partition spec (the _band column); only the n_bands-row prefix
    window may be unpartitioned."""
    plan = olap_customer_abc(
        spark, sf_dir, banded=True)._jdf.queryExecution().toString()
    assert "_band" in plan


def test_value_outliers_approx_tracks_exact(spark, sf_dir):
    exact = {r["priority"]: r for r in
             dq_value_outliers(spark, sf_dir).collect()}
    approx = {r["priority"]: r for r in
              dq_value_outliers(spark, sf_dir, approx=True).collect()}
    assert set(exact) == set(approx)
    for p, e in exact.items():
        a = approx[p]
        assert a["n_rows"] == e["n_rows"]
        iqr = e["q3"] - e["q1"]
        # GK with accuracy=10k on ~15k rows: quantile off by at most a
        # few ranks; generous band relative to the IQR width.
        assert abs(a["q1"] - e["q1"]) <= 0.05 * iqr + 1e-9, p
        assert abs(a["q3"] - e["q3"]) <= 0.05 * iqr + 1e-9, p
        assert abs(a["outlier_frac"] - e["outlier_frac"]) <= 0.01, p
