"""approx_count_distinct option (SURVEY §6, VERDICT r1 item 7):
the HLL++ path must track the exact path within sketch error on the
driver testdata, and the default path must remain exact."""

from __future__ import annotations

from university_data_lakehouse_spark.operators.events import events_user_stats
from university_data_lakehouse_spark.operators.gold import gold_order_metrics

RSD = 0.05


def _rel_err(exact: float, approx: float) -> float:
    return abs(approx - exact) / exact if exact else float(approx != exact)


def test_gold_order_metrics_approx_tracks_exact(spark, sf_dir):
    keys = ["order_year", "segment", "status"]
    exact = {
        tuple(r[k] for k in keys): r["total_customers"]
        for r in gold_order_metrics(spark, sf_dir).collect()
    }
    approx = {
        tuple(r[k] for k in keys): r["total_customers"]
        for r in gold_order_metrics(
            spark, sf_dir, approx_distinct=True, rsd=RSD
        ).collect()
    }
    assert set(exact) == set(approx)  # grouping unaffected
    worst = max(_rel_err(exact[k], approx[k]) for k in exact)
    # HLL++ guarantees ~rsd standard error; 4x headroom kills flake
    assert worst <= 4 * RSD, worst


def test_events_user_stats_approx_tracks_exact(spark, sf_dir):
    exact = {
        r["user_id"]: r["n_event_types"]
        for r in events_user_stats(spark, sf_dir).collect()
    }
    approx = {
        r["user_id"]: r["n_event_types"]
        for r in events_user_stats(
            spark, sf_dir, approx_distinct=True, rsd=RSD
        ).collect()
    }
    assert set(exact) == set(approx)
    worst = max(_rel_err(exact[u], approx[u]) for u in exact)
    assert worst <= 4 * RSD, worst
    # non-distinct aggregates must be untouched by the option
    ex_rows = events_user_stats(spark, sf_dir).select("user_id", "n_events")
    ap_rows = events_user_stats(spark, sf_dir, approx_distinct=True).select(
        "user_id", "n_events"
    )
    assert {tuple(r) for r in ex_rows.collect()} == {tuple(r) for r in ap_rows.collect()}


def test_daily_hll_sketches_merge_to_range_estimate(spark, sf_dir):
    """Mergeable-sketch contract: per-day HLL binaries union to a
    range-wide distinct-user estimate within HLL error of the exact
    count, and a partial date range merges only its days' sketches."""
    from pyspark.sql import functions as F

    from university_data_lakehouse_spark.operators.events import (
        events_daily_user_sketches,
        rollup_user_sketches,
    )
    from university_data_lakehouse_spark.sources.loader import load_table

    daily = events_daily_user_sketches(spark, sf_dir).cache()
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    est = rollup_user_sketches(daily).collect()[0]["approx_users"]
    assert abs(est - exact) / exact < 0.05, (est, exact)

    # range query: merge only the first half of the days
    days = sorted(r.day for r in daily.select("day").collect())
    mid = days[len(days) // 2]
    half = rollup_user_sketches(daily.where(F.col("day") <= mid))
    exact_half = (ev.where(F.to_date("ts") <= F.lit(mid))
                  .select("user_id").distinct().count())
    est_half = half.collect()[0]["approx_users"]
    assert abs(est_half - exact_half) / exact_half < 0.05
    # the sketch column really is an opaque mergeable binary
    assert dict(daily.dtypes)["user_sketch"] == "binary"


def test_token_cms_heavy_hitters_within_bounds(spark, sf_dir):
    """Mergeable Count-Min frequency sketches: per-lang CMS binaries
    merge into a corpus-wide sketch whose estimates obey the CMS
    guarantee (true ≤ est ≤ true + eps·N) for the exact heavy
    hitters — token frequencies without re-scanning text."""
    from pyspark.sql import functions as F

    from university_data_lakehouse_spark.functions.textfns import tokens
    from university_data_lakehouse_spark.operators.text import (
        token_frequency_sketch,
    )
    from university_data_lakehouse_spark.sources.loader import load_table

    doc = load_table(spark, sf_dir, "documents")
    eps = 0.001
    rows = token_frequency_sketch(doc, eps=eps).collect()
    assert len(rows) == 5 and all(isinstance(bytes(r.token_cms), bytes)
                                  for r in rows)
    jvm_cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    merged, total = None, 0
    for r in rows:
        cms = jvm_cms.readFrom(bytes(r.token_cms))
        total += r.n_tokens
        if merged is None:
            merged = cms
        else:
            merged.mergeInPlace(cms)

    exact = {
        r.t: r.n for r in
        doc.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "t").limit(10).collect()
    }
    assert exact
    for t, c in exact.items():
        est = merged.estimateCount(t)
        assert c <= est <= c + eps * total + 1, (t, c, est)


def test_daily_kll_sketches_merge_to_range_quantiles(spark, sf_dir):
    """Mergeable-quantile contract: per-day KLL binaries merge to
    range-wide p50/p90/p99 within KLL rank error of the exact sorted
    percentiles, and a partial date range merges only its days'
    sketches — quantiles over stored bytes, no raw re-scan."""
    from pyspark.sql import functions as F

    from university_data_lakehouse_spark.operators.events import (
        events_daily_value_kll,
        rollup_value_quantiles,
    )
    from university_data_lakehouse_spark.sources.loader import load_table

    daily = events_daily_value_kll(spark, sf_dir).cache()
    ev = load_table(spark, sf_dir, "events")

    def exact_rank_of(value, frame):
        n = frame.count()
        return frame.where(F.col("value") <= value).count() / n

    got = rollup_value_quantiles(daily).collect()[0]
    # KLL guarantees RANK error (~1.65% at k=200): the returned value's
    # true rank must sit near the requested rank
    for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        r = exact_rank_of(got[col], ev)
        assert abs(r - p) < 0.03, (col, got[col], r)

    days = sorted(r.day for r in daily.select("day").collect())
    mid = days[len(days) // 2]
    half_ev = ev.where(F.to_date("ts") <= F.lit(mid))
    half = rollup_value_quantiles(
        daily.where(F.col("day") <= mid)).collect()[0]
    r = exact_rank_of(half["p90"], half_ev)
    assert abs(r - 0.9) < 0.03, (half["p90"], r)
    assert dict(daily.dtypes)["value_kll"] == "binary"
    assert half["n_events"] == half_ev.count()


def test_theta_audience_set_algebra(spark, sf_dir):
    """Theta-sketch contract: per-event-type binaries answer set
    questions (union / intersection / difference of audiences) within
    sketch error of the exact set computations — the algebra HLL
    cannot do."""
    from pyspark.sql import functions as F

    from university_data_lakehouse_spark.operators.events import (
        audience_overlap,
        events_audience_sketches,
    )
    from university_data_lakehouse_spark.sources.loader import load_table

    sk = events_audience_sketches(spark, sf_dir).cache()
    got = audience_overlap(sk, "view", "purchase").collect()[0]

    ev = load_table(spark, sf_dir, "events")
    users = lambda t: {r.user_id for r in ev.where(
        F.col("event_type") == t).select("user_id").distinct().collect()}
    va, pb = users("view"), users("purchase")
    exact = {"n_a": len(va), "n_b": len(pb), "n_union": len(va | pb),
             "n_both": len(va & pb), "n_only_a": len(va - pb)}
    for k, v in exact.items():
        assert abs(got[k] - v) <= max(3, 0.05 * v), (k, got[k], v)
    assert dict(sk.dtypes)["user_theta"] == "binary"
