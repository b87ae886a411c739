"""Event-stream batch operators (SURVEY §2.4, events_* keys).

These are the batch twins of the reference's sensor/schedule-driven
incremental assets (``components/s3_data_landing_component.py:198``):
the same event semantics run as Structured Streaming in
``streaming/``; here they are expressed as declarative batch plans
with DuckDB oracles.

Scale notes: every operator shuffles at most once on its natural key
(window bucket / user_id); the as-of join avoids the classic
range-join blowup by interleaving both sides in ONE sort (union +
last(ignorenulls) over a user-partitioned window) instead of
fan-out join + filter — at 100 TB that is the difference between a
shuffle-sort and an O(events × orders) explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import DEC
from ..sources.loader import load_table

SESSION_GAP_MIN = 30


def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate on event time (batch twin of
    streaming/windowed.py). date_trunc keeps the bucket JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative gap-count: a new session
    starts after a >30-minute silence. One shuffle on user_id; both
    windows share the same partitioning so Spark sorts once."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("session_num", F.sum(is_new).over(wcum))
        .groupBy("user_id", "session_num")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


def _dedup_orders_per_day(orders: DataFrame) -> DataFrame:
    """One order row per (custkey, orderdate) so the as-of pick is
    deterministic under timestamp ties (SURVEY §2.4 oracle note)."""
    return orders.groupBy(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("order_ts"),
    ).agg(
        F.max("o_orderkey").alias("last_orderkey"),
        F.max("o_totalprice").alias("last_order_total"),
    )


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the nearest prior (<= ts) order of
    the same user. Implemented scale-first: union both sides, one
    window sort per user, carry the latest order forward with
    last(ignorenulls). Oracle uses DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    orders = _dedup_orders_per_day(load_table(spark, sf_dir, "orders"))

    ev_side = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "event_type",
        F.lit(None).cast("bigint").alias("o_key"),
        F.lit(None).cast("double").alias("o_total"),
    )
    ord_side = orders.select(
        "user_id",
        F.col("order_ts").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.col("last_orderkey").alias("o_key"),
        F.col("last_order_total").alias("o_total"),
    )
    # order rows sort before event rows at equal t ⇒ `<=` as-of semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = ev_side.unionByName(ord_side).select(
        "user_id", "t", "is_event", "event_id", "event_type",
        F.last("o_key", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_total", ignorenulls=True).over(w).alias("last_order_total"),
    )
    return merged.where(F.col("is_event") == 1).select(
        "event_id",
        "user_id",
        F.col("t").alias("ts"),
        "event_type",
        "last_orderkey",
        "last_order_total",
    )


def events_user_stats(spark: SparkSession, sf_dir: str,
                      approx_distinct: bool = False,
                      rsd: float = 0.05) -> DataFrame:
    """Per-user activity profile: distinct types, span, exact value
    stats. ``approx_distinct=True`` switches the distinct to a
    HyperLogLog++ sketch (SURVEY §6 high-cardinality option; the
    oracle-gated default stays exact)."""
    cd = (lambda c: F.approx_count_distinct(c, rsd)) if approx_distinct \
        else F.countDistinct
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        cd("event_type").alias("n_event_types"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        F.max("value").alias("max_value"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week user retention: of the distinct users active in
    week w, how many are also active in w+1. The (user, week)
    distinct is the only wide stage (one shuffle); the self-join runs
    on the ALREADY-distinct table — #users × #weeks rows, not raw
    events — and shares its (user_id) shuffle key with the distinct.
    Both engines truncate weeks to the ISO Monday."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        # stay TIMESTAMP (both engines' date_trunc yields one; DATE
        # maps to different pandas dtypes per engine)
        F.date_trunc("week", "ts").alias("week"),
    ).distinct()
    nxt = uw.select(
        F.col("user_id").alias("n_user"),
        (F.col("week") - F.expr("INTERVAL 7 DAYS")).alias("prev_week"),
    )
    return (
        uw.join(
            nxt,
            (uw.user_id == nxt.n_user) & (uw.week == nxt.prev_week),
            "left",
        )
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.count("n_user").alias("retained_next_week"),
            (
                F.count("n_user").cast("double")
                / F.nullif(F.count(F.lit(1)), F.lit(0))
            ).alias("retention_rate"),
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel matching (view → click → purchase): per user,
    the first view, the first click AT/AFTER that view, and the first
    purchase at/after that click — the ordered-sequence pattern a
    product-analytics funnel needs (each stage's timestamp must
    respect the previous stage's, not just co-occur).

    Shape: three conditional-min aggregates, all keyed on user_id —
    the shuffles share one partitioning, and each stage joins the
    PREVIOUS stage's 1-row-per-user table (never raw × raw events)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id", "t_view", "t_click", "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .otherwise(1).alias("reached_stage"),
        )
    )


ATTRIBUTION_GAP_MIN = 720   # 12h sessions: testdata density is a few
#                             events/user/day, so 30-min sessions would be
#                             zero-width points and every error an orphan


def events_error_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-INTERVAL join: attribute each error event to the
    same user's activity session whose [start, end] interval contains
    it (sessions built from the NON-error stream), keeping orphan
    errors with a null session — the range-join class (equi prefix +
    BETWEEN residual) that powers attribution, billing-window, and
    SLA lookups. Spark executes it as ONE hash join on user_id with
    the interval predicate as the join residual — never a cartesian;
    a user's sessions are disjoint, so each error matches ≤ 1 row and
    the left join preserves the error grain."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nonerr = ev.where(F.col("event_type") != "error")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > ATTRIBUTION_GAP_MIN * 60 * 1_000_000),
        1,
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        nonerr.withColumn("session_num", F.sum(is_new).over(wcum))
        .groupBy(F.col("user_id").alias("s_user"), "session_num")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"))
    )
    errors = ev.where(F.col("event_type") == "error")
    return (
        errors.join(
            sessions,
            (errors.user_id == sessions.s_user)
            & (errors.ts >= sessions.session_start)
            & (errors.ts <= sessions.session_end),
            "left",
        )
        .select(
            "event_id", "user_id", "ts",
            F.col("session_num").cast("long").alias("session_num"),
            "session_start",
            F.col("session_num").isNull().alias("is_orphan"),
        )
    )


def events_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: resample each user's irregular
    events onto a dense 1-hour grid (their own min..max hour) with
    FORWARD-FILLED hourly averages across the gaps — the
    gap-filling + LOCF operator every time-series store exposes
    (`time_bucket_gapfill`/`locf` in the public TimescaleDB surface)
    that plain GROUP BY cannot express (empty buckets simply don't
    exist in the input). Shape: hourly pre-aggregate (one shuffle),
    per-user grid via sequence+explode (fan-out = span-hours, bounded
    and data-independent per user), one join back on the SAME
    (user, hour) key, and a single ordered window for the fill. The
    hourly avg is an exact-decimal sum ÷ count — both engines carry
    the identical doubles through the fill."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.col("value").cast(DEC)).cast("double")
             / F.count(F.lit(1))).alias("avg_value"),
        )
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("hour", F.min("ts")).alias("h_min"),
             F.date_trunc("hour", F.max("ts")).alias("h_max"))
        .select(
            "user_id",
            F.explode(F.sequence(
                "h_min", "h_max", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id", "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w)
            .alias("filled_avg"),
            F.col("avg_value").isNull().alias("is_gap"),
        )
    )


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured handling: the events table carries a JSON
    ``props`` payload; parse it schema-on-read with ``from_json`` (a
    JVM expression — the parse happens inside whole-stage codegen,
    never in Python) and aggregate the extracted field per event
    type. The 100 TB point: JSON stays a string column in parquet
    until the moment of use, and the parse is a narrow map feeding an
    ordinary one-shuffle aggregate. Ints stay exact: avg is an
    explicit decimal-free sum/count division, identical both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    n = F.count(F.lit(1))
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            n.alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").alias("k_sum"),
            (F.sum("k").cast("double") / F.nullif(F.count("k"), F.lit(0)))
            .alias("k_avg"),
        )
    )


CONV_WINDOW_HOURS = 72


def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel: click within 72h OF THE VIEW,
    purchase within 72h OF THE CLICK — the time-bounded variant of
    events_funnel (product funnels expire; an unbounded sequence
    overcounts). Same scale shape: per-stage conditional mins, each
    stage joining the previous 1-row-per-user table, all shuffles
    sharing the user_id key; the window bound is one extra predicate
    on the already-joined pair. One summary row out — counts are
    exact ints, rates int/int divisions, so both engines agree
    bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    win = F.expr(f"INTERVAL {CONV_WINDOW_HOURS} HOURS")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("ts") >= F.col("t_view"))
               & (F.col("ts") <= F.col("t_view") + win))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((F.col("ts") >= F.col("t_click"))
               & (F.col("ts") <= F.col("t_click") + win))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    per_user = v.join(c, "user_id", "left").join(p, "user_id", "left")
    n_view = F.count(F.lit(1))
    n_click = F.count("t_click")
    n_buy = F.count("t_purchase")
    return per_user.agg(
        n_view.alias("n_viewed"),
        n_click.alias("n_click_within"),
        n_buy.alias("n_purchase_within"),
        (n_click.cast("double") / F.nullif(n_view, F.lit(0)))
        .alias("click_rate"),
        (n_buy.cast("double") / F.nullif(n_click, F.lit(0)))
        .alias("purchase_rate"),
    )


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    week (the cohort), tracked across week offsets — the standard
    product-analytics triangle view, generalizing events_retention's
    single w→w+1 step. Two shuffles: the per-user first-week
    aggregate, then the (cohort, offset) distinct count; the offset
    is exact integer epoch arithmetic so both engines agree."""
    ev = load_table(spark, sf_dir, "events")
    # (user, week) distinct is reused by the cohort aggregate AND the
    # membership join; cache it so raw events are scanned ONCE (the
    # cached frame is users × weeks — orders of magnitude smaller
    # than events at any scale)
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct().cache()
    first = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = uw.join(first, "user_id").select(
        "user_id", "cohort_week",
        ((F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
         / 604800).cast("int").alias("week_offset"),
    )
    # cohort_size == n_active at offset 0 (every user is active in
    # their own cohort week by construction) — the size branch reads
    # the SAME cached aggregate instead of re-deriving from events
    act = joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")).cache()
    sizes = act.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size"))
    return (
        act.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week", "week_offset", "n_active", "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size"))
            .alias("retention_rate"),
        )
    )


def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour moving average of event value per user — a
    RANGE window frame (interval-bounded, peer-inclusive), the window
    class ROWS frames can't express. Spark's rangeBetween needs a
    numeric ordering, so the frame runs over FULL-PRECISION epoch
    microseconds (equivalent to DuckDB's window over epoch_us with a
    3.6e9-µs RANGE — both inclusive of boundary and ts-peers; a
    whole-second cast would collapse sub-second events into RANGE
    peers and shift the trailing boundary by the fraction). The
    average is decimal-sum ÷ count so frame-internal float order
    can't differ between engines. One shuffle on user_id, shared by
    both window functions."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        (
            F.sum(F.col("value").cast(DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("avg_value_1h"),
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
    )


def events_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: per-user value quartiles. The (value,
    event_id) compound ordering is a TOTAL order, so NTILE's
    remainder-to-leading-buckets rule assigns identically in any
    engine. One shuffle on user_id, shared with the ordering sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "user_id", "event_id", "value",
        F.ntile(4).over(w).alias("quartile"),
    )


def events_daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day HLL user sketches — MERGEABLE distinct state, the
    100 TB answer to incremental unique-user counting: each day's
    partition aggregates once into a Datasketches HLL binary
    (order-independent — HLL registers keep maxima), and any date
    range's distinct count is a cheap sketch UNION over stored
    binaries instead of a re-scan of raw events. Sketch binaries are
    engine-specific, so this is a pytest-gated function (estimates
    within HLL error of exact), not an oracle key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.hll_sketch_agg("user_id").alias("user_sketch"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def rollup_user_sketches(daily: DataFrame) -> DataFrame:
    """Union the stored per-day sketches into one range-wide distinct
    estimate — reads ONLY the day-grain sketch table (bytes per day),
    never the raw events."""
    return daily.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("user_sketch")).alias("approx_users"),
        F.sum("n_events").alias("n_events"),
    )


def events_daily_value_kll(spark: SparkSession, sf_dir: str,
                           k: int = 200) -> DataFrame:
    """Per-day KLL quantile sketches over event values — the
    MERGEABLE quantile state that completes the sketch family (HLL =
    distinct, CMS = frequency, KLL = quantiles): each day aggregates
    once into a Datasketches KLL binary, and any date range's
    percentiles come from a sketch MERGE over stored bytes — never a
    re-scan or re-sort of raw events, which is what makes p99 SLO
    dashboards over a 100 TB event table O(days), not O(rows). KLL
    guarantees rank error ~1.65% at k=200 with sublinear size. Sketch
    binaries are engine-specific → pytest-gated (merged quantiles
    within rank error of the exact sort), not an oracle key — same
    rule as the HLL rollup."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.kll_sketch_agg_double("value", F.lit(k)).alias("value_kll"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def rollup_value_quantiles(daily: DataFrame,
                           probs: tuple[float, ...] = (0.5, 0.9, 0.99),
                           ) -> DataFrame:
    """Merge stored per-day KLL sketches into range-wide quantile
    estimates — reads ONLY the day-grain sketch table. Uses the
    distributed ``kll_merge_agg_double`` aggregate (SQL-registered;
    the Python functions module only exposes the two-sketch scalar),
    so the merge gets map-side partials like any other aggregate."""
    merged = F.expr("kll_merge_agg_double(value_kll)")
    return daily.agg(
        *[
            F.kll_sketch_get_quantile_double(merged, F.lit(p))
            .alias(f"p{int(p * 100)}")
            for p in probs
        ],
        F.sum("n_events").alias("n_events"),
    )


def events_audience_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type THETA user sketches — unlike HLL, theta sketches
    support full SET ALGEBRA (union / intersection / difference), so
    audience questions like "users who viewed AND purchased" resolve
    from per-segment binaries without re-scanning events or
    materializing user-level join tables. One shuffle on event_type;
    sketches are bytes per segment. Engine-specific binaries →
    pytest-gated (estimates within sketch error of exact set ops)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.theta_sketch_agg("user_id").alias("user_theta"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def audience_overlap(sketches: DataFrame, type_a: str,
                     type_b: str) -> DataFrame:
    """Set-algebra rollup over stored theta sketches: |A|, |B|,
    |A ∪ B|, |A ∩ B|, |A \\ B| — all from the two segment binaries."""
    pair = sketches.where(
        F.col("event_type").isin(type_a, type_b))
    a = F.expr(
        f"theta_union_agg(CASE WHEN event_type = '{type_a}' "
        "THEN user_theta END)")
    b = F.expr(
        f"theta_union_agg(CASE WHEN event_type = '{type_b}' "
        "THEN user_theta END)")
    agg = pair.agg(a.alias("sk_a"), b.alias("sk_b"))
    est = F.theta_sketch_estimate
    return agg.select(
        est(F.col("sk_a")).alias("n_a"),
        est(F.col("sk_b")).alias("n_b"),
        est(F.expr("theta_union(sk_a, sk_b)")).alias("n_union"),
        est(F.expr("theta_intersection(sk_a, sk_b)")).alias("n_both"),
        est(F.expr("theta_difference(sk_a, sk_b)")).alias("n_only_a"),
    )


def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly flags — the metric-outlier pass an
    events pipeline runs before alerting. Sum and sum-of-squares are
    DECIMAL-exact (order-independent), converted once to double, so
    mean/variance come from identical inputs in both engines; the
    z-score is rounded to 6 decimals on both sides and the anomaly
    flag derives from the ROUNDED value (same determinism treatment
    as text_lm_quality). One shuffle on user_id; all three window
    aggregates share the frame."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    vdec = F.col("value").cast(DEC)
    s = F.sum(vdec).over(w).cast("double")
    ss = F.sum(vdec * vdec).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    z = F.round(
        (F.col("value") - s / n)
        / F.nullif(F.sqrt(F.greatest((ss - s * s / n) / n, F.lit(0.0))),
                   F.lit(0.0)),
        6,
    )
    return ev.select(
        "user_id", "event_id", "value",
        z.alias("zscore"),
        (F.abs(z) >= 3.0).alias("is_anomaly"),
    )


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per user over a compound TOTAL order
    — both are exact small-integer ratios ((rank-1)/(n-1), rows≤/n),
    so the doubles are bit-identical across engines. Completes the
    analytic-window family with NTILE (same single user_id shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "user_id", "event_id", "value",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the path-analysis statistic behind next-action
    prediction and funnel discovery (which step follows which, with
    what probability). lag() over the (user_id, ts, event_id) total
    order pairs each event with its predecessor; the pair table then
    aggregates to event-type × event-type counts.

    Scale shape: ONE shuffle on user_id for the lag window (the same
    partitioning every sequence operator here shares), then the
    count aggregation is map-side-combinable down to at most
    |event_type|² rows — the probability normalization window runs
    on that tiny matrix, never the event stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wrow = Window.partitionBy("from_type")
    prob = (
        F.col("n_transitions").cast("double")
        / F.sum("n_transitions").over(wrow).cast("double")
    )
    return counts.select(
        "from_type", "to_type", "n_transitions", prob.alias("probability")
    )


HIST_BIN_WIDTH = 25.0  # fixed-width value bins (value range ~[0, 500])


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per event type — the
    distribution profiler behind data-drift dashboards. The bin id
    is floor(value / width) (exact in double for these magnitudes,
    identical in both engines); counts and decimal-exact bin sums
    come from ONE map-side-combinable aggregation, output is
    bin-count-sized."""
    ev = load_table(spark, sf_dir, "events")
    bin_id = F.floor(F.col("value") / F.lit(HIST_BIN_WIDTH)).cast("long")
    return (
        ev.groupBy(F.col("event_type"), bin_id.alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .withColumn("bin_low", F.col("bin_id").cast("double")
                    * F.lit(HIST_BIN_WIDTH))
    )


def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic marketing-analytics quartile grid. One per-user
    aggregation (count, decimal-exact value sum, max ts), recency in
    whole days against the corpus max timestamp (a broadcast 1-row
    aggregate, never a driver collect), then three NTILE(4) scores
    (4 = best) over compound total orders so assignment is
    deterministic in any engine.

    Scale shape: the event scan collapses to a users-sized table
    before any window; the three global NTILEs are total sorts of
    that table — at 100 TB you'd replace them with approx_percentile
    cut points (the documented switch, same as
    olap_price_percentiles); the quartile semantics here are the
    exact baseline."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("monetary"),
    )
    ref = ev.agg(F.max(F.to_date("ts")).alias("ref_day"))
    scored = per_user.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days", F.datediff("ref_day", F.to_date("last_ts"))
    )
    wr = Window.orderBy("last_ts", "user_id")
    wf = Window.orderBy("frequency", "user_id")
    wm = Window.orderBy("monetary", "user_id")
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(wr).alias("r_score"),
        F.ntile(4).over(wf).alias("f_score"),
        F.ntile(4).over(wm).alias("m_score"),
    ).withColumn(
        "segment",
        F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"),
    )


def events_first_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution — which
    channel (event type) opened and which closed the path to each
    user's FIRST purchase. The purchase boundary is a per-user 1-row
    aggregate joined back on user_id; the touch window ranks the
    strictly-before, non-purchase events by the unique (ts, event_id)
    total order from BOTH ends (two windows sharing one user_id
    partitioning → one shuffle + one sort), and a final per-user
    aggregate emits one attribution row. Users whose first purchase
    has no prior touches are not attributable and are omitted (the
    standard attribution contract)."""
    ev = load_table(spark, sf_dir, "events")
    first_purchase = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    pre = ev.join(first_purchase, "user_id").where(
        (F.col("event_type") != "purchase")
        & (F.col("ts") < F.col("t_purchase"))
    )
    wa = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = pre.select(
        "user_id", "t_purchase", "event_type",
        F.row_number().over(wa).alias("rn_first"),
        F.row_number().over(wd).alias("rn_last"),
    )
    return ranked.groupBy("user_id", "t_purchase").agg(
        F.max(F.when(F.col("rn_first") == 1, F.col("event_type")))
        .alias("first_touch"),
        F.max(F.when(F.col("rn_last") == 1, F.col("event_type")))
        .alias("last_touch"),
        F.count(F.lit(1)).alias("n_touches"),
    )


PATH_TOP_N = 25   # distinct session paths surfaced
PATH_MAX_LEN = 8  # only the first N steps of a session identify it


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N session paths — the sequence-frequency statistic behind
    funnel DISCOVERY (which journeys actually happen, vs the funnel
    you assumed). Sessions reuse the sessionize gap rule; each
    session's first PATH_MAX_LEN event types concatenate in (ts,
    event_id) order into a path string ('view>click>purchase'), and
    paths rank globally by frequency.

    Scale shape: sessionization's one user_id shuffle, then the path
    build is a per-(user, session) aggregate sharing that
    partitioning (collect_list bounded by the LENGTH CAP — state per
    group is ≤ PATH_MAX_LEN structs after the slice, and the
    deterministic array_sort runs per session, never globally); the
    frequency count + rank run on the distinct-paths table, which the
    cap keeps ≤ |event_types|^PATH_MAX_LEN and in practice
    vocabulary-sized. Ordering is the unique (ts, event_id) compound
    key, so the path string is deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("session_num", F.sum(is_new).over(wcum))
    paths = (
        sess.groupBy("user_id", "session_num")
        .agg(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"],
                ),
                1, PATH_MAX_LEN,
            ).alias("steps")
        )
        .select(F.array_join("steps", ">").alias("path"))
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"))
    wr = Window.orderBy(F.col("n_sessions").desc(), F.col("path"))
    return (
        counts.withColumn("path_rank", F.row_number().over(wr))
        .where(F.col("path_rank") <= PATH_TOP_N)
        .select("path_rank", "path", "n_sessions")
    )


def events_inter_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per event type — the
    instrumentation-health statistic (is the heartbeat cadence
    drifting? are sensors going quiet?). Gaps are EXACT integer
    microseconds between consecutive same-type events of the same
    user (lag over the unique (ts, event_id) order — one shuffle on
    user_id); the per-type aggregate then reports count, mean
    (decimal-exact sum ÷ count) and exact p50/p90 in seconds.
    Quantile interpolation runs on identical integer-derived doubles
    in both engines (the olap_price_percentiles discipline)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w))
    gaps = ev.select(
        "event_type", gap_us.alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    pct = F.expr("percentile(gap_us, array(0.5D, 0.9D))")
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (
            F.sum("gap_us").cast("double")
            / F.count(F.lit(1)).cast("double") / F.lit(1e6)
        ).alias("mean_gap_s"),
        (pct.getItem(0) / F.lit(1e6)).alias("p50_gap_s"),
        (pct.getItem(1) / F.lit(1e6)).alias("p90_gap_s"),
    )


WAU_DAYS = 7
MAU_DAYS = 30


def events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU + stickiness (DAU/MAU) per calendar day — the
    canonical product-health dashboard. The event stream first
    collapses to the distinct (user, day) table; each of its rows
    then CONTRIBUTES to the ≤7 / ≤30 trailing windows it falls in via
    a bounded explode (fan-out 30 of a users×days-sized table —
    metadata next to the stream), and a distinct count per
    (window day) gives the trailing actives. Only days with actual
    activity are reported. All-integer arithmetic; stickiness divides
    two exact counts. At 100 TB the explode stays proportional to
    users×days, never events — the pre-collapse IS the operator; the
    sketch-based alternative (daily HLL union, events_daily_user_
    sketches) answers the same question without the fan-out when
    approximate counts suffice."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(MAU_DAYS - 1))
        ).alias("offset"),
        "day",
    ).select(
        "user_id",
        "offset",
        F.date_add("day", F.col("offset")).alias("report_day"),
    )
    agg = contrib.join(
        days.select(F.col("day").alias("report_day")), "report_day"
    ).groupBy("report_day").agg(
        F.countDistinct(
            F.when(F.col("offset") == 0, F.col("user_id"))
        ).alias("dau"),
        F.countDistinct(
            F.when(F.col("offset") < WAU_DAYS, F.col("user_id"))
        ).alias("wau"),
        F.countDistinct("user_id").alias("mau"),
    )
    return agg.select(
        # stay TIMESTAMP on the way out: a DATE maps to different
        # pandas dtypes per engine (the olap_running_revenue note)
        F.col("report_day").cast("timestamp").alias("report_day"),
        "dau", "wau", "mau",
        (
            F.col("dau").cast("double") / F.col("mau").cast("double")
        ).alias("stickiness"),
    )


QUERIES = {
    "events_active_users": events_active_users,
    "events_rfm": events_rfm,
    "events_inter_event_gap": events_inter_event_gap,
    "events_top_paths": events_top_paths,
    "events_first_last_touch": events_first_last_touch,
    "events_transition_matrix": events_transition_matrix,
    "events_value_histogram": events_value_histogram,
    "events_anomaly": events_anomaly,
    "events_value_percentiles": events_value_percentiles,
    "events_value_quartiles": events_value_quartiles,
    "events_windowed_agg": events_windowed_agg,
    "events_funnel": events_funnel,
    "events_funnel_windowed": events_funnel_windowed,
    "events_json_props": events_json_props,
    "events_resample_1h": events_resample_1h,
    "events_error_attribution": events_error_attribution,
    "events_cohort_retention": events_cohort_retention,
    "events_moving_avg": events_moving_avg,
    "events_sessionize": events_sessionize,
    "events_asof_join": events_asof_join,
    "events_user_stats": events_user_stats,
    "events_retention": events_retention,
}

_SESSION_SQL = f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_num
        FROM flagged
    )
    SELECT user_id, CAST(session_num AS BIGINT) AS session_num,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM numbered GROUP BY user_id, session_num
"""

_Z_SQL = (
    "(value - s / n) / NULLIF(sqrt(GREATEST((ss - s * s / n) / n, 0.0)),"
    " 0.0)"
)

ORACLES = {
    "events_inter_event_gap": """
        WITH g AS (
            SELECT event_type,
                   epoch_us(ts) - epoch_us(LAG(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id)) AS gap_us
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS n_gaps,
               CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   / 1000000.0 AS mean_gap_s,
               quantile_cont(gap_us, 0.5) / 1000000.0 AS p50_gap_s,
               quantile_cont(gap_us, 0.9) / 1000000.0 AS p90_gap_s
        FROM g WHERE gap_us IS NOT NULL
        GROUP BY 1
    """,
    "events_top_paths": f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                                > {SESSION_GAP_MIN} * 60 * 1000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT user_id, ts, event_id, event_type,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING)
                       AS session_num
            FROM flagged
        ),
        paths AS (
            SELECT array_to_string(
                       list_slice(
                           list_transform(
                               list_sort(list((ts, event_id, event_type))),
                               s -> s[3]),
                           1, {PATH_MAX_LEN}),
                       '>') AS path
            FROM numbered GROUP BY user_id, session_num
        ),
        c AS (SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY 1)
        SELECT path_rank, path, n_sessions FROM (
            SELECT path, n_sessions,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path)
                        AS INTEGER) AS path_rank
            FROM c
        ) WHERE path_rank <= {PATH_TOP_N}
    """,
    "events_first_last_touch": """
        WITH fp AS (
            SELECT user_id, MIN(ts) AS t_purchase
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        pre AS (
            SELECT e.user_id, fp.t_purchase, e.event_type,
                   ROW_NUMBER() OVER (PARTITION BY e.user_id
                                      ORDER BY e.ts, e.event_id)
                       AS rn_first,
                   ROW_NUMBER() OVER (PARTITION BY e.user_id
                                      ORDER BY e.ts DESC, e.event_id DESC)
                       AS rn_last
            FROM events e JOIN fp ON fp.user_id = e.user_id
            WHERE e.event_type <> 'purchase' AND e.ts < fp.t_purchase
        )
        SELECT user_id, t_purchase,
               MAX(CASE WHEN rn_first = 1 THEN event_type END)
                   AS first_touch,
               MAX(CASE WHEN rn_last = 1 THEN event_type END)
                   AS last_touch,
               COUNT(*) AS n_touches
        FROM pre GROUP BY 1, 2
    """,
    "events_active_users": f"""
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        days AS (SELECT DISTINCT day AS report_day FROM ud),
        contrib AS (
            SELECT user_id, o AS "offset", day + CAST(o AS INTEGER)
                       AS report_day
            FROM ud, (SELECT unnest(range(0, {MAU_DAYS})) AS o)
        )
        SELECT CAST(c.report_day AS TIMESTAMP) AS report_day,
               COUNT(DISTINCT CASE WHEN c."offset" = 0
                                   THEN c.user_id END) AS dau,
               COUNT(DISTINCT CASE WHEN c."offset" < {WAU_DAYS}
                                   THEN c.user_id END) AS wau,
               COUNT(DISTINCT c.user_id) AS mau,
               CAST(COUNT(DISTINCT CASE WHEN c."offset" = 0
                                        THEN c.user_id END) AS DOUBLE)
                   / CAST(COUNT(DISTINCT c.user_id) AS DOUBLE)
                   AS stickiness
        FROM contrib c JOIN days d ON d.report_day = c.report_day
        GROUP BY 1
    """,
    "events_rfm": """
        WITH u AS (
            SELECT user_id,
                   MAX(ts) AS last_ts,
                   COUNT(*) AS frequency,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                       AS monetary
            FROM events GROUP BY 1
        ),
        r AS (SELECT MAX(CAST(ts AS DATE)) AS ref_day FROM events)
        SELECT user_id,
               CAST(date_diff('day', CAST(last_ts AS DATE), ref_day)
                    AS INTEGER) AS recency_days,
               frequency, monetary,
               CAST(NTILE(4) OVER (ORDER BY last_ts, user_id)
                    AS INTEGER) AS r_score,
               CAST(NTILE(4) OVER (ORDER BY frequency, user_id)
                    AS INTEGER) AS f_score,
               CAST(NTILE(4) OVER (ORDER BY monetary, user_id)
                    AS INTEGER) AS m_score,
               CAST(NTILE(4) OVER (ORDER BY last_ts, user_id) * 100
                    + NTILE(4) OVER (ORDER BY frequency, user_id) * 10
                    + NTILE(4) OVER (ORDER BY monetary, user_id)
                    AS INTEGER) AS segment
        FROM u CROSS JOIN r
    """,
    "events_transition_matrix": """
        WITH pairs AS (
            SELECT LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                       AS from_type,
                   event_type AS to_type
            FROM events
        ),
        c AS (
            SELECT from_type, to_type, COUNT(*) AS n_transitions
            FROM pairs WHERE from_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, n_transitions,
               CAST(n_transitions AS DOUBLE)
                   / CAST(SUM(n_transitions)
                          OVER (PARTITION BY from_type) AS DOUBLE)
                   AS probability
        FROM c
    """,
    "events_value_histogram": f"""
        SELECT event_type,
               CAST(FLOOR(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin_id,
               COUNT(*) AS n_events,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                   AS sum_value,
               CAST(CAST(FLOOR(value / {HIST_BIN_WIDTH}) AS BIGINT)
                    AS DOUBLE) * {HIST_BIN_WIDTH} AS bin_low
        FROM events
        GROUP BY 1, 2
    """,
    "events_anomaly": f"""
        WITH w AS (
            SELECT user_id, event_id, value,
                   CAST(SUM(CAST(value AS DECIMAL(18,4)))
                        OVER (PARTITION BY user_id) AS DOUBLE) AS s,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))
                            * CAST(value AS DECIMAL(18,4)))
                        OVER (PARTITION BY user_id) AS DOUBLE) AS ss,
                   CAST(COUNT(*) OVER (PARTITION BY user_id) AS DOUBLE) AS n
            FROM events
        )
        SELECT user_id, event_id, value,
               ROUND({_Z_SQL}, 6) AS zscore,
               ABS(ROUND({_Z_SQL}, 6)) >= 3.0 AS is_anomaly
        FROM w
    """,
    "events_value_percentiles": """
        SELECT user_id, event_id, value,
               PERCENT_RANK() OVER (PARTITION BY user_id
                                    ORDER BY value, event_id) AS pct_rank,
               CUME_DIST() OVER (PARTITION BY user_id
                                 ORDER BY value, event_id) AS cume_dist
        FROM events
    """,
    "events_value_quartiles": """
        SELECT user_id, event_id, value,
               CAST(NTILE(4) OVER (PARTITION BY user_id
                                   ORDER BY value, event_id)
                    AS INTEGER) AS quartile
        FROM events
    """,
    "events_moving_avg": """
        SELECT user_id, event_id, ts, value,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                   / COUNT(*) OVER w AS avg_value_1h,
               COUNT(*) OVER w AS n_events_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING
                           AND CURRENT ROW)
    """,
    "events_funnel": """
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
                               AND e.ts >= v.t_view
            WHERE e.event_type = 'click' GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
                               AND e.ts >= c.t_click
            WHERE e.event_type = 'purchase' GROUP BY 1
        )
        SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
               CASE WHEN p.t_purchase IS NOT NULL THEN 3
                    WHEN c.t_click IS NOT NULL THEN 2
                    ELSE 1 END AS reached_stage
        FROM v
        LEFT JOIN c ON c.user_id = v.user_id
        LEFT JOIN p ON p.user_id = v.user_id
    """,
    "events_error_attribution": f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w
                                > INTERVAL {ATTRIBUTION_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events WHERE event_type <> 'error'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING)
                       AS session_num
            FROM flagged
        ),
        sessions AS (
            SELECT user_id AS s_user, session_num,
                   MIN(ts) AS session_start, MAX(ts) AS session_end
            FROM numbered GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.ts,
               CAST(s.session_num AS BIGINT) AS session_num,
               s.session_start,
               s.session_num IS NULL AS is_orphan
        FROM events e
        LEFT JOIN sessions s
               ON e.user_id = s.s_user
              AND e.ts >= s.session_start AND e.ts <= s.session_end
        WHERE e.event_type = 'error'
    """,
    "events_resample_1h": """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                       / COUNT(*) AS avg_value
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT user_id,
                   date_trunc('hour', MIN(ts)) AS h_min,
                   date_trunc('hour', MAX(ts)) AS h_max
            FROM events GROUP BY 1
        ),
        grid AS (
            SELECT b.user_id, g.h AS hour
            FROM bounds b,
                 LATERAL unnest(generate_series(
                     b.h_min, b.h_max, INTERVAL 1 HOUR)) AS g(h)
        )
        SELECT g.user_id, g.hour,
               COALESCE(h.n_events, 0) AS n_events,
               LAST_VALUE(h.avg_value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_avg,
               h.avg_value IS NULL AS is_gap
        FROM grid g
        LEFT JOIN hourly h
               ON g.user_id = h.user_id AND g.hour = h.hour
    """,
    "events_json_props": """
        WITH t AS (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(k) AS n_with_k,
               MIN(k) AS k_min,
               MAX(k) AS k_max,
               CAST(SUM(k) AS BIGINT) AS k_sum,
               CAST(SUM(k) AS DOUBLE) / NULLIF(COUNT(k), 0) AS k_avg
        FROM t GROUP BY 1
    """,
    "events_funnel_windowed": f"""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
                 AND e.ts >= v.t_view
                 AND e.ts <= v.t_view + INTERVAL {CONV_WINDOW_HOURS} HOUR
            WHERE e.event_type = 'click' GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
                 AND e.ts >= c.t_click
                 AND e.ts <= c.t_click + INTERVAL {CONV_WINDOW_HOURS} HOUR
            WHERE e.event_type = 'purchase' GROUP BY 1
        )
        SELECT COUNT(*) AS n_viewed,
               COUNT(c.t_click) AS n_click_within,
               COUNT(p.t_purchase) AS n_purchase_within,
               CAST(COUNT(c.t_click) AS DOUBLE)
                   / NULLIF(COUNT(*), 0) AS click_rate,
               CAST(COUNT(p.t_purchase) AS DOUBLE)
                   / NULLIF(COUNT(c.t_click), 0) AS purchase_rate
        FROM v
        LEFT JOIN c ON c.user_id = v.user_id
        LEFT JOIN p ON p.user_id = v.user_id
    """,
    "events_cohort_retention": """
        WITH uw AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS week
            FROM events
        ),
        first AS (
            SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1
        ),
        j AS (
            SELECT uw.user_id, f.cohort_week,
                   CAST((epoch(uw.week) - epoch(f.cohort_week))
                        / 604800 AS INTEGER) AS week_offset
            FROM uw JOIN first f ON uw.user_id = f.user_id
        ),
        act AS (
            SELECT cohort_week, week_offset,
                   COUNT(DISTINCT user_id) AS n_active
            FROM j GROUP BY 1, 2
        ),
        sizes AS (
            SELECT cohort_week, n_active AS cohort_size
            FROM act WHERE week_offset = 0
        )
        SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
               CAST(a.n_active AS DOUBLE) / s.cohort_size
                   AS retention_rate
        FROM act a JOIN sizes s ON a.cohort_week = s.cohort_week
    """,
    "events_windowed_agg": """
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "events_sessionize": _SESSION_SQL,
    "events_asof_join": """
        WITH ord AS (
            SELECT o_custkey AS user_id, o_orderdate AS order_ts,
                   MAX(o_orderkey) AS last_orderkey,
                   MAX(o_totalprice) AS last_order_total
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.ts, e.event_type,
               d.last_orderkey, d.last_order_total
        FROM events e
        ASOF LEFT JOIN ord d
             ON e.user_id = d.user_id AND e.ts >= d.order_ts
    """,
    "events_retention": """
        WITH uw AS (
            SELECT DISTINCT user_id,
                   date_trunc('week', ts) AS week
            FROM events
        )
        SELECT a.week,
               COUNT(*) AS active_users,
               COUNT(b.user_id) AS retained_next_week,
               CAST(COUNT(b.user_id) AS DOUBLE)
                   / NULLIF(COUNT(*), 0) AS retention_rate
        FROM uw a
        LEFT JOIN uw b ON b.user_id = a.user_id
                      AND a.week = b.week - INTERVAL 7 DAY
        GROUP BY a.week
    """,
    "events_user_stats": """
        SELECT user_id,
               COUNT(*) AS n_events,
               COUNT(DISTINCT event_type) AS n_event_types,
               MIN(ts) AS first_ts,
               MAX(ts) AS last_ts,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
               MAX(value) AS max_value,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
        FROM events GROUP BY user_id
    """,
}
