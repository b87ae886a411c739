"""Data-quality check operators.

Reference parity: the five check types registered in
``components/trino_iceberg_transform_component.py:192-206``
(not_null_pk, no_duplicates, row_count, referential_integrity,
value_range) plus the freshness/completeness checks at
``components/s3_data_landing_component.py:165-196`` and
``components/gold_analytics_component.py:165-196`` (those two are
exercised by ``plans.checks``; see tests).

Checks are data-driven from ``sources.registry.SOURCE_REGISTRY`` —
the same pattern as the reference's per-transform
``data_quality_checks`` lists — and each check is one aggregate
query, so at 100 TB it is a single scan with map-side partial
aggregation (counts only, never a collect of violating rows).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.loader import load_table, scatter
from ..sources.registry import SOURCE_REGISTRY

# Tables covered by PK-style checks (every registered table).
_PK_TABLES = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings")


def _union(dfs: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), dfs)


def dq_not_null_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """not_null_pk: rows whose primary-key column(s) contain NULL."""
    parts = []
    for t in _PK_TABLES:
        pk = SOURCE_REGISTRY[t].primary_key
        cond = reduce(lambda a, c: a | F.col(c).isNull(),
                      pk[1:], F.col(pk[0]).isNull())
        parts.append(
            load_table(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"),
                F.count(F.when(cond, F.lit(1))).alias("null_pk_count"),
            )
        )
    return _union(parts)


def dq_no_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """no_duplicates: COUNT(*) - COUNT(DISTINCT pk) per table."""
    parts = []
    for t in _PK_TABLES:
        pk = SOURCE_REGISTRY[t].primary_key
        key = F.concat_ws("|", *[F.col(c).cast("string") for c in pk])
        parts.append(
            load_table(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"),
                (F.count(F.lit(1)) - F.countDistinct(key)).alias("duplicate_count"),
            )
        )
    return _union(parts)


def dq_row_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_count per table (reference uses it as a >0 gate)."""
    parts = [
        load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"),
            F.count(F.lit(1)).alias("row_count"),
        )
        for t in _PK_TABLES
    ]
    return _union(parts)


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """referential_integrity: orphan-FK counts for every registry FK.
    Implemented as LEFT ANTI joins (parent side broadcast when
    dim-sized) — returns counts only, scan-shaped at any scale."""
    parts = []
    for t in _PK_TABLES:
        for col, (ptable, pcol) in sorted(SOURCE_REGISTRY[t].foreign_keys.items()):
            child = load_table(spark, sf_dir, t).select(F.col(col))
            parent = load_table(spark, sf_dir, ptable).select(F.col(pcol))
            orphans = child.where(F.col(col).isNotNull()).join(
                parent, child[col] == parent[pcol], "left_anti"
            )
            parts.append(
                orphans.agg(
                    F.lit(f"{t}.{col}->{ptable}.{pcol}").alias("relation"),
                    F.count(F.lit(1)).alias("orphan_count"),
                )
            )
    return _union(parts)


def dq_value_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value_range: out-of-bounds counts for every registry range rule."""
    parts = []
    for t in _PK_TABLES:
        for col, (lo, hi) in sorted(SOURCE_REGISTRY[t].value_ranges.items()):
            parts.append(
                load_table(spark, sf_dir, t).agg(
                    F.lit(f"{t}.{col}").alias("rule"),
                    F.count(
                        F.when(
                            F.col(col).isNotNull()
                            & ((F.col(col) < lo) | (F.col(col) > hi)),
                            F.lit(1),
                        )
                    ).alias("violation_count"),
                )
            )
    return _union(parts)


def _sql_union(selects: list[str]) -> str:
    return "\nUNION ALL\n".join(selects)


def _oracle_not_null_pk() -> str:
    sel = []
    for t in _PK_TABLES:
        pk = SOURCE_REGISTRY[t].primary_key
        cond = " OR ".join(f"{c} IS NULL" for c in pk)
        sel.append(
            f"SELECT '{t}' AS table_name, "
            f"COUNT(CASE WHEN {cond} THEN 1 END) AS null_pk_count FROM {t}"
        )
    return _sql_union(sel)


def _oracle_no_duplicates() -> str:
    sel = []
    for t in _PK_TABLES:
        pk = SOURCE_REGISTRY[t].primary_key
        key = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in pk)
        sel.append(
            f"SELECT '{t}' AS table_name, "
            f"COUNT(*) - COUNT(DISTINCT {key}) AS duplicate_count FROM {t}"
        )
    return _sql_union(sel)


def _oracle_row_count() -> str:
    return _sql_union(
        [f"SELECT '{t}' AS table_name, COUNT(*) AS row_count FROM {t}"
         for t in _PK_TABLES]
    )


def _oracle_referential_integrity() -> str:
    sel = []
    for t in _PK_TABLES:
        for col, (ptable, pcol) in sorted(SOURCE_REGISTRY[t].foreign_keys.items()):
            sel.append(
                f"SELECT '{t}.{col}->{ptable}.{pcol}' AS relation, COUNT(*) AS orphan_count "
                f"FROM {t} c WHERE c.{col} IS NOT NULL AND NOT EXISTS "
                f"(SELECT 1 FROM {ptable} p WHERE p.{pcol} = c.{col})"
            )
    return _sql_union(sel)


def _oracle_value_range() -> str:
    sel = []
    for t in _PK_TABLES:
        for col, (lo, hi) in sorted(SOURCE_REGISTRY[t].value_ranges.items()):
            sel.append(
                f"SELECT '{t}.{col}' AS rule, "
                f"COUNT(CASE WHEN {col} IS NOT NULL AND ({col} < {lo} OR {col} > {hi}) "
                f"THEN 1 END) AS violation_count FROM {t}"
            )
    return _sql_union(sel)


# (column, is_numeric) spec for the profiled table — static so the
# Spark plan and the SQL oracle are generated from the same list
_PROFILE_TABLE = "orders"
_PROFILE_COLS = (
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
)


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profiling (the dbt/Deequ-style profile every
    quality framework starts from): per column — null count/fraction,
    exact distinct count, numeric min/max. Computed as ONE wide
    aggregate over ONE scan (all columns' metrics in the same pass,
    map-side partials), then unpivoted to long form with inline() —
    profile cost never multiplies by column count."""
    df = load_table(spark, sf_dir, _PROFILE_TABLE)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c, numeric in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        if numeric:
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
    wide = df.agg(*aggs)
    structs = []
    for c, numeric in _PROFILE_COLS:
        mn = F.col(f"mn_{c}") if numeric else F.lit(None).cast("double")
        mx = F.col(f"mx_{c}") if numeric else F.lit(None).cast("double")
        structs.append(F.struct(
            F.lit(c).alias("column_name"),
            F.col("n").alias("n_rows"),
            (F.col("n") - F.col(f"nn_{c}")).alias("null_count"),
            ((F.col("n") - F.col(f"nn_{c}")).cast("double") / F.col("n"))
            .alias("null_frac"),
            F.col(f"nd_{c}").alias("n_distinct"),
            mn.alias("num_min"),
            mx.alias("num_max"),
        ))
    return wide.select(F.inline(F.array(*structs)))


def _oracle_profile() -> str:
    aggs = ["COUNT(*) AS n"]
    sel = []
    for c, numeric in _PROFILE_COLS:
        aggs.append(f"COUNT({c}) AS nn_{c}")
        aggs.append(f"COUNT(DISTINCT {c}) AS nd_{c}")
        if numeric:
            aggs.append(f"CAST(MIN({c}) AS DOUBLE) AS mn_{c}")
            aggs.append(f"CAST(MAX({c}) AS DOUBLE) AS mx_{c}")
        mn = f"mn_{c}" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"mx_{c}" if numeric else "CAST(NULL AS DOUBLE)"
        sel.append(
            f"SELECT '{c}' AS column_name, n AS n_rows, "
            f"n - nn_{c} AS null_count, "
            f"CAST(n - nn_{c} AS DOUBLE) / n AS null_frac, "
            f"nd_{c} AS n_distinct, {mn} AS num_min, {mx} AS num_max "
            "FROM a"
        )
    body = " UNION ALL ".join(sel)
    return (f"WITH a AS (SELECT {', '.join(aggs)} "
            f"FROM {_PROFILE_TABLE}) {body}")


DQ_OUTLIER_APPROX_ACCURACY = 10_000  # approx_percentile 1/eps knob


def dq_value_outliers(spark: SparkSession, sf_dir: str,
                      approx: bool = False) -> DataFrame:
    """Tukey-fence (IQR) outlier detection per group — the
    distributional DQ check complementing dq_value_range's static
    bounds: fences derive from the data (q1 − 1.5·IQR, q3 + 1.5·IQR),
    so drift is caught without hand-set thresholds. Pass 1 computes
    exact group quantiles (group-count-sized result, broadcast back);
    pass 2 counts fence violations in one conditional aggregation —
    the documented two-scan cost.

    ``approx=True`` is the 100 TB switch: ``approx_percentile``
    (Greenwald-Khanna, mergeable partial sketches — no per-group
    value sort, bounded memory per task) replaces the exact
    ``percentile`` in pass 1; fences and the violation count are
    otherwise identical. Registry/oracle use the exact form;
    test_approx_switches pins the approx fences to the exact ones at
    rank-error tolerance (the events_user_stats approx_distinct
    discipline). Quantile interpolation and fence arithmetic are the
    same double expressions in both engines (the
    olap_price_percentiles discipline)."""
    from ..functions.joins import maybe_broadcast  # noqa: PLC0415

    orders = load_table(spark, sf_dir, "orders")
    if approx:
        pct = F.expr(
            "approx_percentile(o_totalprice, array(0.25D, 0.75D), "
            f"{DQ_OUTLIER_APPROX_ACCURACY})"
        )
    else:
        pct = F.expr("percentile(o_totalprice, array(0.25D, 0.75D))")
    fences = orders.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        pct.getItem(0).alias("q1"),
        pct.getItem(1).alias("q3"),
    ).select(
        "priority", "q1", "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    joined = orders.join(
        maybe_broadcast(fences),
        F.col("o_orderpriority") == F.col("priority"),
    )
    return joined.groupBy("priority", "q1", "q3", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(
            F.when(
                (F.col("o_totalprice") < F.col("lo"))
                | (F.col("o_totalprice") > F.col("hi")), 1
            )
        ).alias("n_outliers"),
    ).withColumn(
        "outlier_frac",
        F.col("n_outliers").cast("double") / F.col("n_rows").cast("double"),
    )


# (table, event-time column) pairs with freshness expectations —
# mirrors the per-source freshness SLAs in sources/systems.py
_FRESHNESS_COLS = (
    ("orders", "o_orderdate"),
    ("lineitem", "l_shipdate"),
    ("events", "ts"),
)


def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness watermarks per time-bearing table (the reference's
    freshness checks, s3_data_landing_component.py:165-196, as an
    ORACLE-CHECKED registry key — the SLA evaluation against now()
    lives in sources/systems.py where it belongs; this key reports
    the watermark facts a monitor alerts on): newest and oldest
    event time plus the span in whole days. One metadata-cheap
    min/max aggregate per table — at 100 TB these come from footer
    stats via a manifest, not a scan."""
    parts = []
    for t, col in _FRESHNESS_COLS:
        parts.append(
            load_table(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"),
                F.min(col).alias("oldest_ts"),
                F.max(col).alias("newest_ts"),
                F.datediff(F.max(col), F.min(col)).alias("span_days"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
    return _union(parts)


PSI_SMOOTH = 1          # Laplace count so absent categories stay finite
PSI_ALERT = 0.2         # the standard "significant shift" threshold
PSI_Q = 1_000_000       # fixed-point quantum for the order-free total
PSI_BUCKET_US = 3_600_000_000   # 1-hour split granularity (micros)


def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-Stability-Index drift check over the events stream:
    split the table at the midpoint of its time range (reference =
    first half, current = second half — the standard
    train-vs-serve / week-over-week shape), compare the event_type
    distributions, and report per-type PSI contributions plus the
    total with the classic alert threshold (PSI ≥ 0.2).

    Math discipline: Laplace smoothing ((n+1)/(N+k)) keeps absent
    categories finite with pure integer ratios; the midpoint test is
    ``2·bucket ≥ min+max`` over 1-hour bucket indices computed with an
    EXPLICIT floor division — ``x div B - (x % B < 0)`` on the Spark
    side and the same CASE form over ``//`` in the oracle.  That form
    yields floor(x/B) under BOTH quotient conventions (truncating
    ``div``/``%`` pairs with a dividend-sign remainder; flooring pairs
    subtract 0), so pre-1970 timestamps bucket identically across
    engines regardless of either engine's native ``div`` semantics —
    tested with a pre-epoch fixture (r11 ADVICE; empirically DuckDB
    1.0 ``//`` truncates like Spark ``div``, but nothing should hinge
    on that).  The one libm call (ln of a probability ratio) is
    ROUND(…,6) in both engines; and the total sums the rounded
    contributions as fixed-point BIGINTs (PSI contributions are
    provably ≥ 0, so floor(x·1e6) is safe) — order-independent, so
    the window sum is bit-stable.

    Scale shape (r10, one-scan): a SINGLE full scan pre-aggregates to
    (event_type, hour_bucket, cnt) with map-side combine; the
    time-range midpoint and the ref/cur split are then derived FROM
    that bucket table (|event_types|·|hours|-sized metadata) via a
    single-partition window — the r9 shape scanned events twice (one
    min/max pass + one conditional-count pass).  Splitting at hour
    granularity instead of the raw microsecond is the standard PSI
    framing (reference vs current WINDOW) and is what makes the
    one-scan derivation exact."""
    from pyspark.sql import Window  # noqa: PLC0415

    # NULL timestamps are excluded in BOTH engines: Spark's
    # when/otherwise would count a NULL-ts row in NEITHER half while
    # SQL's CASE ... ELSE would count it as reference — the one row
    # shape where the two engines disagree (r10 self-review).
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull())
    # explicit floor division (see docstring): correct for negative
    # epochs under either engine's native quotient convention.
    bkt = F.expr(
        f"unix_micros(ts) div {PSI_BUCKET_US}"
        f" - (CASE WHEN unix_micros(ts) % {PSI_BUCKET_US} < 0"
        f"      THEN 1 ELSE 0 END)"
    )
    buckets = ev.groupBy(
        F.col("event_type"), bkt.alias("bkt")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy()
    is_cur = (
        F.col("bkt") * 2 >= F.min("bkt").over(w) + F.max("bkt").over(w)
    )
    counts = (
        buckets.withColumn("is_cur", is_cur)
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(~F.col("is_cur"), F.col("cnt")).otherwise(F.lit(0))
            ).alias("n_ref"),
            F.sum(
                F.when(F.col("is_cur"), F.col("cnt")).otherwise(F.lit(0))
            ).alias("n_cur"),
        )
    )
    p_ref = (F.col("n_ref") + PSI_SMOOTH).cast("double") / (
        F.sum("n_ref").over(w) + F.count(F.lit(1)).over(w)
    ).cast("double")
    p_cur = (F.col("n_cur") + PSI_SMOOTH).cast("double") / (
        F.sum("n_cur").over(w) + F.count(F.lit(1)).over(w)
    ).cast("double")
    scored = counts.select(
        "event_type", "n_ref", "n_cur",
        p_ref.alias("p_ref"), p_cur.alias("p_cur"),
    ).withColumn(
        "psi_contribution",
        F.round(
            (F.col("p_ref") - F.col("p_cur"))
            * F.log(F.col("p_ref") / F.col("p_cur")),
            6,
        ),
    )
    psi_total = (
        F.sum(
            F.floor(F.col("psi_contribution") * PSI_Q).cast("long")
        ).over(w).cast("double")
        / F.lit(float(PSI_Q))
    )
    return scored.select(
        "*",
        psi_total.alias("psi_total"),
        (psi_total >= PSI_ALERT).cast("int").alias("drift_flag"),
    )


KS_C_ALPHA = 1.358      # c(α) at the classic α = 0.05


def dq_ks_drift(spark: SparkSession, sf_dir: str,
                binned: int | None = None) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift check over the events
    VALUE distribution, per event_type — the numeric complement of
    ``dq_psi_drift``'s categorical PSI: split the stream at the
    midpoint of its time range (reference = first half, current =
    second), and report D = max_x |F_ref(x) − F_cur(x)| with the
    classic large-sample threshold c(0.05)·√((n+m)/(n·m)).

    Math discipline: the empirical CDFs are EXACT integer cumulative
    counts over the grouped (event_type, value) table; the only float
    ops are two correctly-rounded IEEE divisions per distinct value
    and the one √ in the threshold — both ROUND(…,6) with the flag
    derived from the ROUNDED values (the libm discipline).

    Scale shape: one tiny 1-row bounds aggregate (ts column only),
    then ONE full scan grouping to (event_type, value) with map-side
    combine. The per-type ordered cumulative window is the inherent
    KS shape (a sorted CDF); ``binned=k`` is the 100 TB switch —
    ``F.round(value, k)`` in the groupBy caps each type's grouped
    relation (and therefore its cumulative window) at grid size
    regardless of raw value cardinality. Rounding is monotone
    non-decreasing, so the binned statistic evaluates the exact CDF
    gap on a SUBSET of evaluation points: D_binned ≤ D_exact always,
    with error bounded by the largest single-bin probability mass —
    test_approx_switches pins both properties against the exact form
    (the dq_value_outliers approx=True discipline). Registry/oracle
    use the exact form; the driver key is unchanged. The bounds pass
    stays separate by design: deriving global min/max from the
    grouped table via a single-partition window would funnel the
    value-cardinality-sized relation through one task."""
    from pyspark.sql import Window  # noqa: PLC0415

    # NULL values are excluded in BOTH engines (Spark sorts NULLS
    # FIRST ascending, DuckDB NULLS LAST — a null group would
    # diverge), and so are NULL timestamps (Spark's when/otherwise
    # counts them in neither half, SQL's CASE-ELSE as reference)
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull())
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    )
    is_cur = F.unix_micros("ts") * 2 >= F.col("mn") + F.col("mx")
    val = (F.round(F.col("value"), binned) if binned is not None
           else F.col("value"))
    per_val = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("event_type", val.alias("value"))
        .agg(
            F.sum((~is_cur).cast("long")).alias("r"),
            F.sum(is_cur.cast("long")).alias("c"),
        )
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULLIF'd denominators: an event_type present in only ONE half
    # (the most-drifted case) has n_ref or n_cur = 0 — a bare
    # division would THROW under Spark's default ANSI mode and yield
    # NULL in DuckDB (r10 self-review). NULL-safe gaps make max()
    # skip them; the degenerate type reports D = 1.0 (one CDF is a
    # whole distribution the other never accumulates), a NULL
    # threshold (undefined at n·m = 0) and drift_flag = 1.
    gap = F.abs(
        F.sum("r").over(w_cum).cast("double")
        / F.nullif(F.col("n_ref"), F.lit(0.0))
        - F.sum("c").over(w_cum).cast("double")
        / F.nullif(F.col("n_cur"), F.lit(0.0))
    )
    w_type = Window.partitionBy("event_type")
    scored = per_val.withColumn(
        "n_ref", F.sum("r").over(w_type).cast("double")
    ).withColumn(
        "n_cur", F.sum("c").over(w_type).cast("double")
    ).withColumn("gap", gap)
    out = scored.groupBy("event_type").agg(
        F.first("n_ref").cast("long").alias("n_ref"),
        F.first("n_cur").cast("long").alias("n_cur"),
        F.round(F.coalesce(F.max("gap"), F.lit(1.0)), 6).alias("ks_stat"),
    )
    thr = F.round(
        F.lit(KS_C_ALPHA)
        * F.sqrt(
            (F.col("n_ref") + F.col("n_cur")).cast("double")
            / F.nullif(
                F.col("n_ref").cast("double")
                * F.col("n_cur").cast("double"),
                F.lit(0.0),
            )
        ),
        6,
    )
    return out.select(
        "event_type", "n_ref", "n_cur", "ks_stat",
        thr.alias("ks_threshold"),
        F.when((F.col("n_ref") == 0) | (F.col("n_cur") == 0), F.lit(1))
        .otherwise((F.col("ks_stat") > thr).cast("int"))
        .alias("drift_flag"),
    )


# First-digit expected proportions ROUND(log10(1 + 1/d), 6), baked as
# LITERALS into both engines (no runtime libm at all); Nigrini's MAD
# conformity bands.
BENFORD_EXPECTED = {d: round(math.log10(1 + 1 / d), 6)
                    for d in range(1, 10)}
BENFORD_Q = 1_000_000_000       # fixed-point quantum for the MAD sum
BENFORD_MAD_BANDS = (           # (upper bound on MAD, label)
    (0.006, "close"),
    (0.012, "acceptable"),
    (0.015, "marginal"),
)


def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit conformity check over order
    totals — the classic anomaly/fraud DQ signal for naturally-grown
    monetary data (Nigrini's MAD test): observed first-digit
    proportions vs log10(1 + 1/d), mean absolute deviation across
    the nine digits, conformity band.

    Math discipline: the first digit comes from the DECIMAL STRING
    of the integer cents (BIGINT→VARCHAR is pure integer repr,
    engine-identical — never from float formatting); expected
    proportions are Python-computed literals shared with the SQL
    text, so no runtime libm anywhere; the 9 absolute deviations are
    summed as fixed-point BIGINTs (order-independent) and divided
    once.

    Scale shape: one scan with map-side combine to a 9-row digit
    table; everything downstream is constant-sized."""
    from pyspark.sql import Window  # noqa: PLC0415

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    counts = (
        orders.where(F.col("o_totalprice").isNotNull()
                     & (F.col("o_totalprice") > 0))
        .select(F.substring(cents.cast("string"), 1, 1)
                .cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_values"))
    )
    digits = spark.range(1, 10).select(F.col("id").cast("int")
                                       .alias("digit"))
    full = digits.join(counts, "digit", "left").select(
        "digit", F.coalesce("n_values", F.lit(0)).alias("n_values"))
    w = Window.partitionBy()
    expected = F.element_at(
        F.array(*[F.lit(BENFORD_EXPECTED[d]) for d in range(1, 10)]),
        F.col("digit"),
    )
    obs = F.col("n_values").cast("double") / F.nullif(
        F.sum("n_values").over(w).cast("double"), F.lit(0.0))
    scored = full.select(
        "digit", "n_values",
        obs.alias("observed_prop"),
        expected.alias("expected_prop"),
    ).withColumn(
        "abs_dev", F.abs(F.col("observed_prop") - F.col("expected_prop"))
    )
    mad = F.round(
        F.sum(F.floor(F.col("abs_dev") * BENFORD_Q).cast("long")).over(w)
        .cast("double") / F.lit(float(BENFORD_Q) * 9.0),
        6,
    )
    conformity = F.when(mad <= BENFORD_MAD_BANDS[0][0],
                        F.lit(BENFORD_MAD_BANDS[0][1]))
    for bound, label in BENFORD_MAD_BANDS[1:]:
        conformity = conformity.when(mad <= bound, F.lit(label))
    conformity = conformity.otherwise(F.lit("nonconforming"))
    return scored.select(
        "*", mad.alias("mad"), conformity.alias("conformity"),
    )


EMB_NORM_Q = 1_000_000_000      # fixed-point quantum for norm means
EMB_DIM_EXPECTED = 64           # the corpus contract (similarity.EMB_DIM)


def dq_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table health check per label — the DQ gate an
    ANN/dedup pipeline runs before indexing 100 TB of vectors:
    vector count, NULL-embedding count, wrong-dimension count,
    non-finite component count (NaN/±Inf), zero-norm count (vectors
    cosine can't score), and the norm's min/max/mean.

    Math discipline: counts are exact integer folds; the norm is the
    usual strict-left-fold sqrt (ROUND-6 in both engines); the MEAN
    norm is quantized floor(x·1e9) and summed as BIGINTs, so it is
    order-independent and bit-identical across engines (the
    emb_label_centroids trick). An invalid COMPONENT is NULL, NaN or
    ±Inf (arrow/pandas writers routinely sanitize NaN to null inside
    list columns, so both spellings of a bad float must count); the
    oracle uses IS NULL / isnan() / isinf() with the identical
    branch shape.

    Scale shape: one scan, one narrow fold per row, map-side-combined
    groupBy(label) → |labels|-sized output."""
    # scatter: the per-row fold work (64-element HOF folds, no
    # codegen) otherwise runs on the single-row-group scan's ONE task.
    emb = scatter(load_table(spark, sf_dir, "embeddings"),
                  min_input_bytes=2 << 20)
    v = F.col("embedding")
    dim_ok = F.size(v) == EMB_DIM_EXPECTED
    n_bad = F.aggregate(
        F.transform(
            v, lambda x: F.when(
                x.isNull()
                | F.isnan(x.cast("double"))
                | (F.abs(x.cast("double")) == float("inf")),
                F.lit(1)).otherwise(F.lit(0))),
        F.lit(0), lambda a, x: a + x)
    nrm = F.round(
        F.sqrt(F.aggregate(
            F.transform(v, lambda x: x.cast("double")
                        * x.cast("double")),
            F.lit(0.0), lambda a, x: a + x)), 6)
    rows = emb.select(
        "label",
        v.isNull().cast("long").alias("is_null"),
        F.when(v.isNull(), F.lit(0))
        .otherwise((~dim_ok).cast("int")).cast("long").alias("bad_dim"),
        F.when(v.isNull() | ~dim_ok, F.lit(0))
        .otherwise((n_bad > 0).cast("int")).cast("long")
        .alias("non_finite"),
        F.when(v.isNull() | ~dim_ok | (n_bad > 0), F.lit(None))
        .otherwise(nrm).alias("nrm"),
    )
    return rows.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("is_null").alias("n_null"),
        F.sum("bad_dim").alias("n_bad_dim"),
        F.sum("non_finite").alias("n_non_finite"),
        F.sum(F.when(F.col("nrm") == 0.0, F.lit(1))
              .otherwise(F.lit(0)).cast("long")).alias("n_zero_norm"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
        (F.sum(F.floor(F.col("nrm") * EMB_NORM_Q).cast("long"))
         .cast("double") / F.lit(float(EMB_NORM_Q))
         / F.nullif(F.count("nrm").cast("double"), F.lit(0.0)))
        .alias("mean_norm"),
    )


QUERIES = {
    "dq_embedding_health": dq_embedding_health,
    "dq_benford": dq_benford,
    "dq_ks_drift": dq_ks_drift,
    "dq_psi_drift": dq_psi_drift,
    "dq_freshness": dq_freshness,
    "dq_value_outliers": dq_value_outliers,
    "dq_profile": dq_profile,
    "dq_not_null_pk": dq_not_null_pk,
    "dq_no_duplicates": dq_no_duplicates,
    "dq_row_count": dq_row_count,
    "dq_referential_integrity": dq_referential_integrity,
    "dq_value_range": dq_value_range,
}

def _oracle_freshness() -> str:
    sel = []
    for t, col in _FRESHNESS_COLS:
        sel.append(
            f"SELECT '{t}' AS table_name, MIN({col}) AS oldest_ts, "
            f"MAX({col}) AS newest_ts, "
            f"CAST(date_diff('day', CAST(MIN({col}) AS DATE), "
            f"CAST(MAX({col}) AS DATE)) AS INTEGER) AS span_days, "
            f"COUNT(*) AS n_rows FROM {t}"
        )
    return _sql_union(sel)


ORACLES = {
    "dq_freshness": _oracle_freshness(),
    "dq_value_outliers": """
        WITH f AS (
            SELECT o_orderpriority AS priority,
                   quantile_cont(o_totalprice, 0.25) AS q1,
                   quantile_cont(o_totalprice, 0.75) AS q3
            FROM orders GROUP BY 1
        ),
        fences AS (
            SELECT priority, q1, q3,
                   q1 - 1.5 * (q3 - q1) AS lo,
                   q3 + 1.5 * (q3 - q1) AS hi
            FROM f
        )
        SELECT fe.priority, fe.q1, fe.q3, fe.lo, fe.hi,
               COUNT(*) AS n_rows,
               COUNT(CASE WHEN o.o_totalprice < fe.lo
                          OR o.o_totalprice > fe.hi
                        THEN 1 END) AS n_outliers,
               CAST(COUNT(CASE WHEN o.o_totalprice < fe.lo
                               OR o.o_totalprice > fe.hi
                             THEN 1 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS outlier_frac
        FROM orders o JOIN fences fe ON o.o_orderpriority = fe.priority
        GROUP BY 1, 2, 3, 4, 5
    """,
    "dq_profile": _oracle_profile(),
    "dq_not_null_pk": _oracle_not_null_pk(),
    "dq_no_duplicates": _oracle_no_duplicates(),
    "dq_row_count": _oracle_row_count(),
    "dq_referential_integrity": _oracle_referential_integrity(),
    "dq_value_range": _oracle_value_range(),
}

ORACLES["dq_embedding_health"] = f"""
    WITH e AS (
        SELECT label, embedding,
               embedding IS NULL AS isnull_v,
               CASE WHEN embedding IS NULL THEN FALSE
                    ELSE len(embedding) <> {EMB_DIM_EXPECTED}
               END AS bad_dim,
               CASE WHEN embedding IS NULL
                         OR len(embedding) <> {EMB_DIM_EXPECTED}
                    THEN FALSE
                    ELSE len(list_filter(embedding, x ->
                         x IS NULL
                         OR isnan(CAST(x AS DOUBLE))
                         OR isinf(CAST(x AS DOUBLE)))) > 0
               END AS non_finite
        FROM embeddings
    ),
    r AS (
        SELECT label, isnull_v, bad_dim, non_finite,
               CASE WHEN isnull_v OR bad_dim OR non_finite THEN NULL
                    ELSE ROUND(sqrt(list_reduce(
                         list_prepend(0.0, list_transform(embedding,
                             x -> CAST(x AS DOUBLE)
                                  * CAST(x AS DOUBLE))),
                         (a, b) -> a + b)), 6)
               END AS nrm
        FROM e
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN isnull_v THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(SUM(CASE WHEN bad_dim THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bad_dim,
           CAST(SUM(CASE WHEN non_finite THEN 1 ELSE 0 END) AS BIGINT)
               AS n_non_finite,
           CAST(SUM(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_norm,
           MIN(nrm) AS min_norm,
           MAX(nrm) AS max_norm,
           (CAST(SUM(CAST(FLOOR(nrm * {EMB_NORM_Q}) AS BIGINT))
                 AS DOUBLE) / {EMB_NORM_Q}.0)
               / NULLIF(CAST(COUNT(nrm) AS DOUBLE), 0.0) AS mean_norm
    FROM r GROUP BY 1
"""

_BENFORD_ARR = "[" + ", ".join(
    str(BENFORD_EXPECTED[d]) for d in range(1, 10)) + "]"
ORACLES["dq_benford"] = f"""
    WITH src AS (
        SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100)
                                    AS BIGINT) AS VARCHAR), 1, 1)
                    AS INTEGER) AS digit
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
    ),
    c AS (SELECT digit, COUNT(*) AS nv FROM src GROUP BY 1),
    d AS (SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS digit),
    f AS (
        SELECT d.digit, CAST(COALESCE(c.nv, 0) AS BIGINT) AS n_values
        FROM d LEFT JOIN c ON c.digit = d.digit
    ),
    s AS (
        SELECT digit, n_values,
               CAST(n_values AS DOUBLE)
                   / NULLIF(CAST(SUM(n_values) OVER () AS DOUBLE), 0.0)
                   AS observed_prop,
               ({_BENFORD_ARR})[digit] AS expected_prop
        FROM f
    ),
    s2 AS (
        SELECT *, ABS(observed_prop - expected_prop) AS abs_dev FROM s
    ),
    m AS (
        SELECT *,
               ROUND(CAST(SUM(CAST(FLOOR(abs_dev * {BENFORD_Q})
                                   AS BIGINT)) OVER () AS DOUBLE)
                     / {BENFORD_Q * 9}.0, 6) AS mad
        FROM s2
    )
    SELECT digit, n_values, observed_prop, expected_prop, abs_dev, mad,
           CASE WHEN mad <= {BENFORD_MAD_BANDS[0][0]}
                    THEN '{BENFORD_MAD_BANDS[0][1]}'
                WHEN mad <= {BENFORD_MAD_BANDS[1][0]}
                    THEN '{BENFORD_MAD_BANDS[1][1]}'
                WHEN mad <= {BENFORD_MAD_BANDS[2][0]}
                    THEN '{BENFORD_MAD_BANDS[2][1]}'
                ELSE 'nonconforming'
           END AS conformity
    FROM m
"""

_KS_THR = (f"ROUND({KS_C_ALPHA} * sqrt(CAST(n_ref + n_cur AS DOUBLE)"
           " / NULLIF(CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE),"
           " 0.0)), 6)")
ORACLES["dq_ks_drift"] = f"""
    WITH b AS (
        SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    pv AS (
        SELECT event_type, value,
               CAST(SUM(CASE WHEN epoch_us(ts) * 2 >= b.mn + b.mx
                             THEN 0 ELSE 1 END) AS BIGINT) AS r,
               CAST(SUM(CASE WHEN epoch_us(ts) * 2 >= b.mn + b.mx
                             THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM events CROSS JOIN b
        WHERE value IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               SUM(r) OVER (PARTITION BY event_type ORDER BY value
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_r,
               SUM(c) OVER (PARTITION BY event_type ORDER BY value
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_c,
               SUM(r) OVER (PARTITION BY event_type) AS nr,
               SUM(c) OVER (PARTITION BY event_type) AS nc
        FROM pv
    ),
    g AS (
        SELECT event_type,
               CAST(MAX(nr) AS BIGINT) AS n_ref,
               CAST(MAX(nc) AS BIGINT) AS n_cur,
               ROUND(COALESCE(MAX(ABS(
                   CAST(cum_r AS DOUBLE)
                       / NULLIF(CAST(nr AS DOUBLE), 0.0)
                   - CAST(cum_c AS DOUBLE)
                       / NULLIF(CAST(nc AS DOUBLE), 0.0))), 1.0), 6)
                   AS ks_stat
        FROM s GROUP BY 1
    )
    SELECT event_type, n_ref, n_cur, ks_stat,
           {_KS_THR} AS ks_threshold,
           CASE WHEN n_ref = 0 OR n_cur = 0 THEN 1
                ELSE CAST(ks_stat > {_KS_THR} AS INTEGER)
           END AS drift_flag
    FROM g
"""

ORACLES["dq_psi_drift"] = f"""
    WITH bk AS (
        SELECT event_type,
               epoch_us(ts) // {PSI_BUCKET_US}
                 - (CASE WHEN epoch_us(ts) % {PSI_BUCKET_US} < 0
                         THEN 1 ELSE 0 END) AS bkt,
               COUNT(*) AS cnt
        FROM events
        WHERE ts IS NOT NULL
        GROUP BY 1, 2
    ),
    sp AS (
        SELECT event_type, bkt, cnt,
               bkt * 2 >= MIN(bkt) OVER () + MAX(bkt) OVER () AS is_cur
        FROM bk
    ),
    c AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN is_cur THEN 0 ELSE cnt END)
                    AS BIGINT) AS n_ref,
               CAST(SUM(CASE WHEN is_cur THEN cnt ELSE 0 END)
                    AS BIGINT) AS n_cur
        FROM sp
        GROUP BY 1
    ),
    t AS (
        SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc, COUNT(*) AS k
        FROM c
    ),
    p AS (
        SELECT c.event_type, c.n_ref, c.n_cur,
               CAST(c.n_ref + {PSI_SMOOTH} AS DOUBLE)
                   / CAST(t.tr + t.k AS DOUBLE) AS p_ref,
               CAST(c.n_cur + {PSI_SMOOTH} AS DOUBLE)
                   / CAST(t.tc + t.k AS DOUBLE) AS p_cur
        FROM c CROSS JOIN t
    ),
    q AS (
        SELECT *,
               ROUND((p_ref - p_cur) * ln(p_ref / p_cur), 6)
                   AS psi_contribution
        FROM p
    ),
    s AS (
        SELECT CAST(SUM(CAST(FLOOR(psi_contribution * {PSI_Q})
                             AS BIGINT)) AS DOUBLE) / {PSI_Q}.0
                   AS psi_total
        FROM q
    )
    SELECT q.event_type, q.n_ref, q.n_cur, q.p_ref, q.p_cur,
           q.psi_contribution, s.psi_total,
           CAST(s.psi_total >= {PSI_ALERT} AS INTEGER) AS drift_flag
    FROM q CROSS JOIN s
"""
