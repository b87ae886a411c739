"""Plan-shape regression tests (SURVEY §5.6).

At 100 TB the difference between a broadcast-hash join and a
sort-merge join on a dim table, or between a pushed-down filter and a
full scan, is the difference between minutes and hours. These tests
pin the physical-plan properties the scale design (SURVEY §6) relies
on, so a refactor that silently regresses them fails CI.
"""
from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from university_data_lakehouse_spark.functions.joins import (
    maybe_broadcast,
    parse_bytes,
    plan_size_estimate,
)
from university_data_lakehouse_spark.operators import silver, gold, olap, events
from university_data_lakehouse_spark.sources.loader import load_table


def _plan(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def _tree(plan: str) -> str:
    """Just the operator tree (before the per-node details)."""
    return plan.split("\n\n", 1)[0]


# ---------------------------------------------------------------- joins


@pytest.mark.parametrize(
    "fn",
    [
        silver.silver_dim_customers,
        silver.silver_dim_suppliers,
        olap.olap_local_supplier_volume,
    ],
)
def test_bounded_dim_joins_are_broadcast(spark, sf_dir, fn):
    """Joins against schema-bounded dims (nation <= 25 rows,
    region <= 5) must be broadcast-hash at ANY scale factor — these
    are the only joins where an unconditional broadcast is safe."""
    tree = _tree(_plan(fn(spark, sf_dir)))
    assert "BroadcastHashJoin" in tree, tree


@pytest.mark.parametrize(
    "fn",
    [
        silver.silver_fact_orders,
        silver.silver_fact_contacts,
        gold.gold_order_metrics,
        olap.olap_shipping_priority,
    ],
)
def test_gated_customer_joins_broadcast_at_test_sf(spark, sf_dir, fn):
    """Customer-sided joins are size-gated (maybe_broadcast): at test
    SFs the estimate fits the threshold so the hint applies and no
    sort-merge of the fact side appears. At 100 TB the same code path
    returns the frame unhinted (see test_maybe_broadcast_gate)."""
    tree = _tree(_plan(fn(spark, sf_dir)))
    assert "BroadcastHashJoin" in tree, tree
    assert "SortMergeJoin" not in tree, tree


def test_maybe_broadcast_gate(spark, sf_dir):
    """The size gate must refuse to hint a frame whose estimate
    exceeds the threshold — this is the 100 TB safety property."""
    cust = load_table(spark, sf_dir, "customer")
    est = plan_size_estimate(cust)
    assert est > 0
    # under the gate: hint applied (plan carries a broadcast hint)
    hinted = maybe_broadcast(cust, max_bytes=est + 1)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    # over the gate: frame returned unhinted
    unhinted = maybe_broadcast(cust, max_bytes=est - 1)
    assert "ResolvedHint" not in unhinted._jdf.queryExecution().analyzed().toString()
    # threshold disabled (-1): never hint
    disabled = maybe_broadcast(cust, max_bytes=-1)
    assert "ResolvedHint" not in disabled._jdf.queryExecution().analyzed().toString()


def test_salted_join_matches_unsalted(spark, sf_dir):
    """salted_join must be result-identical to the plain join while
    spreading each key over n_salts reducers."""
    from university_data_lakehouse_spark.functions.joins import salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    plain = orders.join(cust, "c_custkey")
    salted = salted_join(orders, cust, ["c_custkey"], n_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_salted_join_left_identity_and_refused_types(spark):
    """left joins (unmatched BIG rows) stay identical under salting;
    right/full are refused — the small side's unmatched rows would
    replicate once per salt (ADVICE r3)."""
    import pytest as _pytest

    from university_data_lakehouse_spark.functions.joins import salted_join

    big = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (3, "w")], ["k", "payload"]
    )
    small = spark.createDataFrame([(1, "a"), (2, "b"), (9, "unmatched")],
                                  ["k", "dim"])
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, ["k"], n_salts=4, how="left")
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}
    for bad in ("right", "full", "full_outer", "right_outer"):
        with _pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, ["k"], how=bad)


def test_parse_bytes():
    assert parse_bytes("10485760") == 10 << 20
    assert parse_bytes("10MB") == 10 << 20
    assert parse_bytes("1g") == 1 << 30
    assert parse_bytes("-1") == -1


# ---------------------------------------------------------- pushdown


@pytest.mark.parametrize(
    "fn,pushed_col",
    [
        (olap.olap_pricing_summary, "l_shipdate"),
        (olap.olap_revenue_forecast, "l_shipdate"),
        (olap.olap_shipping_priority, "o_orderdate"),
    ],
)
def test_filters_reach_parquet_scan(spark, sf_dir, fn, pushed_col):
    plan = _plan(fn(spark, sf_dir))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(pushed_col in p for p in pushed), plan


def test_scan_prunes_columns(spark, sf_dir):
    """Q6 projects 4 columns; the parquet ReadSchema must not contain
    untouched wide columns like l_comment."""
    plan = _plan(olap.olap_revenue_forecast(spark, sf_dir))
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas and all("l_comment" not in s for s in schemas), plan


# ------------------------------------------------------- shuffle count


def test_q1_single_exchange(spark, sf_dir):
    """Q1 is scan → partial agg → ONE exchange → final agg. A second
    exchange means partial aggregation was lost."""
    tree = _tree(_plan(olap.olap_pricing_summary(spark, sf_dir)))
    assert tree.count("Exchange") == 1, tree
    assert tree.count("HashAggregate") == 2, tree


def test_sessionize_single_shuffle_per_window_chain(spark, sf_dir):
    """lag + cumulative sum + groupBy all share (user_id) partitioning;
    the plan must reuse one hash exchange, not re-shuffle per step."""
    tree = _tree(_plan(events.events_sessionize(spark, sf_dir)))
    assert tree.count("Exchange") <= 2, tree


def test_asof_join_no_cartesian(spark, sf_dir):
    tree = _tree(_plan(events.events_asof_join(spark, sf_dir)))
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """SURVEY §6's bucketing claim, proven on the plan: a fact-fact
    equi-join between two tables bucketed on the join key needs NO
    Exchange — the co-located buckets sort-merge directly. This is
    the 100 TB answer for repeated silver fact-fact joins."""
    from university_data_lakehouse_spark.sources.loader import (
        load_table,
        write_bucketed,
    )

    warehouse = str(tmp_path / "wh")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, f"{warehouse}/li_b", "li_b", "l_orderkey", 8)
    write_bucketed(orders, f"{warehouse}/ord_b", "ord_b", "o_orderkey", 8)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable auto-broadcast: at test SF the small side would
        # broadcast and mask the property under test — at 100 TB both
        # sides are fact-scale and bucketed SMJ is the real plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        tree = _tree(_plan(joined))
        assert "Exchange" not in tree, tree
        assert "SortMergeJoin" in tree, tree
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


# ------------------------------------------------- r4 operator plans


def test_min_cost_supplier_broadcasts_dims_no_cartesian(spark, sf_dir):
    """Q2-shape: the min-agg join-back must stay an equi hash join
    (no cartesian / nested-loop), and the part/supplier/nation dims
    must broadcast at test SF."""
    tree = _tree(_plan(olap.olap_min_cost_supplier(spark, sf_dir)))
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert "BroadcastHashJoin" in tree, tree


def test_market_share_single_aggregation_pass(spark, sf_dir):
    """Q8-shape: nation revenue and total revenue come from ONE
    aggregate (conditional sum), not two scans of the fact."""
    plan = _plan(olap.olap_market_share(spark, sf_dir))
    tree = _tree(plan)
    assert tree.count("Scan parquet") <= 5, tree  # each table once
    assert "BroadcastHashJoin" in tree, tree


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    """Decontamination joins exploded train shingles against the
    distinct-projected benchmark set — the benchmark side must hash-
    or broadcast-join (never nested-loop), and the documents scan must
    prune to the text/doc_id columns."""
    from university_data_lakehouse_spark.operators.pipeline import (
        text_contamination,
    )

    plan = _plan(text_contamination(spark, sf_dir))
    tree = _tree(plan)
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas and all("source" not in s for s in schemas), plan


def test_sampling_is_scan_plus_filter_only(spark, sf_dir):
    """Hash-gated sampling must stay a narrow map: scan → project →
    filter, zero exchanges."""
    from university_data_lakehouse_spark.operators.pipeline import (
        sample_stratified,
    )

    tree = _tree(_plan(sample_stratified(spark, sf_dir)))
    assert "Exchange" not in tree, tree


def test_pack_bins_partitioned_window_single_exchange(spark, sf_dir):
    """Token packing windows are partitioned by lang: both window
    steps and the row_number share ONE hash exchange on the partition
    key (plus nothing else) — no global sort."""
    from university_data_lakehouse_spark.operators.pipeline import (
        pack_token_bins,
    )

    tree = _tree(_plan(pack_token_bins(spark, sf_dir)))
    assert tree.count("Exchange") == 1, tree


# ------------------------------------------------- r5 OLAP additions


def test_returned_items_pushdown_and_topn(spark, sf_dir):
    """Q10 shape: returnflag + order-date filters reach the parquet
    scans; LIMIT-over-sort executes as TakeOrdered (per-partition
    heap), never a global Sort materialization."""
    plan = _plan(olap.olap_returned_items(spark, sf_dir))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("l_returnflag" in p for p in pushed), plan
    assert any("o_orderdate" in p for p in pushed), plan
    assert "TakeOrderedAndProject" in _tree(plan), _tree(plan)


def test_promo_revenue_single_aggregation_pass(spark, sf_dir):
    """Q14 shape: promo and total sums come from ONE aggregation over
    one scan of the filtered fact — no second scan, no join of two
    aggregates; the part dim broadcasts."""
    tree = _tree(_plan(olap.olap_promo_revenue(spark, sf_dir)))
    assert "BroadcastHashJoin" in tree, tree
    assert tree.count("Scan parquet") == 2, tree  # lineitem + part once


def test_avg_yearly_no_cartesian_shared_key_shuffle(spark, sf_dir):
    """Q17 shape: the per-part mean join-back is an equi-join on
    partkey (plus a non-equi residual) — no cartesian/nested-loop
    product of the fact with itself."""
    tree = _tree(_plan(olap.olap_avg_yearly(spark, sf_dir)))
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree


def test_big_orders_having_shares_orderkey_shuffle(spark, sf_dir):
    """Q18 shape: the HAVING aggregate and the orders join-back both
    key on orderkey; the plan must not add a third exchange beyond
    (agg shuffle + join shuffle of the orders side)."""
    tree = _tree(_plan(olap.olap_big_orders(spark, sf_dir)))
    assert "CartesianProduct" not in tree, tree
    assert tree.count("Exchange") <= 3, tree


def test_customer_distribution_two_aggregation_levels(spark, sf_dir):
    """Q13 shape: count-of-counts is two aggregation levels (custkey,
    then n_orders) — partial aggregation must survive at both."""
    tree = _tree(_plan(olap.olap_customer_distribution(spark, sf_dir)))
    assert tree.count("HashAggregate") >= 4, tree  # 2 levels x partial+final


def test_lm_quality_broadcasts_model_not_corpus(spark, sf_dir):
    """text_lm_quality must build/broadcast the VOCAB side (the model,
    metadata-sized) — never the exploded corpus token stream, which at
    100 TB is the biggest relation in the plan."""
    from university_data_lakehouse_spark.operators import text

    tree = _tree(_plan(text.text_lm_quality(spark, sf_dir)))
    assert "BroadcastHashJoin Inner BuildRight" in tree, tree
    # the broadcast subtree is the cached vocab, not a raw scan+explode
    assert "InMemoryRelation" in tree, tree


def test_corpus_stats_single_scan_no_joins(spark, sf_dir):
    """corpus_stats claims ONE scan and ONE grouped pass (all funnel
    stages as conditional aggregates over shared predicate
    expressions): one dup-flag window exchange + one agg exchange,
    zero joins."""
    from university_data_lakehouse_spark.operators import pipeline

    tree = _tree(_plan(pipeline.corpus_stats(spark, sf_dir)))
    assert tree.count("Scan parquet") == 1, tree
    assert tree.count("Exchange") == 2, tree
    assert "Join" not in tree, tree


def test_events_anomaly_shared_window_single_shuffle(spark, sf_dir):
    """events_anomaly's three window aggregates (sum, sum-of-squares,
    count) share one user_id frame: one scan, one exchange, one
    Window operator."""
    from university_data_lakehouse_spark.operators import events as ev

    tree = _tree(_plan(ev.events_anomaly(spark, sf_dir)))
    assert tree.count("Scan parquet") == 1, tree
    assert tree.count("Exchange") == 1, tree
    assert tree.count("Window") == 1, tree


def test_waiting_suppliers_single_fact_pass(spark, sf_dir):
    """Q21 shape: the EXISTS/NOT-EXISTS pair must collapse into ONE
    grouped pass — the lineitem fact is scanned exactly once (no
    self-joins), and nothing degenerates into a cartesian product."""
    tree = _tree(_plan(olap.olap_waiting_suppliers(spark, sf_dir)))
    assert tree.count("Scan parquet") == 4, tree  # li+orders+supp+nation
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree


def test_disjunctive_revenue_single_scan_each_side(spark, sf_dir):
    """Q19 shape: the OR-of-conjunctions evaluates in one pass — no
    union-of-three-scans rewrite; part broadcasts into the fact."""
    tree = _tree(_plan(olap.olap_disjunctive_revenue(spark, sf_dir)))
    assert tree.count("Scan parquet") == 2, tree  # lineitem + part once
    assert "BroadcastHashJoin" in tree, tree
    assert "Union" not in tree, tree


def test_profit_by_nation_single_aggregation_pass(spark, sf_dir):
    """Q9 shape: revenue and cost sums come from ONE aggregation
    (partial + final) over the joined fact — no per-measure re-scan,
    no cartesian."""
    tree = _tree(_plan(olap.olap_profit_by_nation(spark, sf_dir)))
    assert tree.count("HashAggregate") == 2, tree
    assert "CartesianProduct" not in tree, tree


def test_supplier_part_counts_anti_join_broadcasts(spark, sf_dir):
    """Q16 shape: the NOT IN exclusion is a broadcast LEFT ANTI (the
    blacklist is a handful of keys) — never a shuffled anti join of
    the fact."""
    tree = _tree(_plan(olap.olap_supplier_part_counts(spark, sf_dir)))
    assert "BroadcastHashJoin LeftAnti" in tree, tree


def test_excess_suppliers_semi_join_broadcasts(spark, sf_dir):
    """Q20 shape: the surviving (suppkey) key set is tiny and must
    broadcast into the supplier side as a LEFT SEMI."""
    tree = _tree(_plan(olap.olap_excess_suppliers(spark, sf_dir)))
    assert "BroadcastHashJoin LeftSemi" in tree, tree
    assert "CartesianProduct" not in tree, tree


def test_json_props_parses_in_codegen_no_python(spark, sf_dir):
    """The JSON parse must be a JVM expression (from_json inside the
    codegen stage) — no Python evaluation node — over one scan and
    one aggregation pass."""
    tree = _tree(_plan(events.events_json_props(spark, sf_dir)))
    assert "BatchEvalPython" not in tree and "ArrowEvalPython" not in tree
    assert tree.count("Scan parquet") == 1, tree
    assert tree.count("HashAggregate") == 2, tree


def test_name_fuzzy_blocked_equi_join_no_cartesian(spark, sf_dir):
    """Entity-resolution blocking must be an EQUI join on the block
    key — Levenshtein runs as a post-join filter on candidates, never
    as a cartesian product of the name vocabulary."""
    from university_data_lakehouse_spark.operators import dedup

    tree = _tree(_plan(dedup.dedup_name_fuzzy(spark, sf_dir)))
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree


def test_dq_profile_single_scan_single_agg(spark, sf_dir):
    """All columns' profile metrics must come from ONE scan and ONE
    aggregation (multi-countDistinct expands, but never to a second
    parquet scan)."""
    from university_data_lakehouse_spark.operators import quality

    tree = _tree(_plan(quality.dq_profile(spark, sf_dir)))
    assert tree.count("Scan parquet") == 1, tree


def test_cohort_retention_single_events_scan(spark, sf_dir):
    """Raw events must be scanned ONCE: the (user, week) distinct and
    the cohort aggregate are cached for their second uses, so both
    reuse branches read InMemoryRelation, and nothing degenerates
    into a cartesian."""
    tree = _tree(_plan(events.events_cohort_retention(spark, sf_dir)))
    assert "CartesianProduct" not in tree, tree
    # every consumer branch reads the caches (the raw scans in the
    # dump live INSIDE InMemoryRelation build fragments, which
    # materialize once), so ≥2 cache reads and ≥2 cached fragments
    assert tree.count("InMemoryTableScan") >= 2, tree
    assert tree.count("InMemoryRelation") >= 2, tree


def test_chunking_is_narrow_generate_only(spark, sf_dir):
    """Sliding-window chunking must stay scan → generate → project:
    zero exchanges (the fan-out is per-row, never cross-row)."""
    from university_data_lakehouse_spark.operators.pipeline import (
        chunk_documents,
    )

    tree = _tree(_plan(chunk_documents(spark, sf_dir)))
    assert "Exchange" not in tree, tree
    assert "Generate" in tree, tree


def test_split_assignment_is_scan_plus_project_only(spark, sf_dir):
    """Hash-gated split assignment is a pure narrow map: zero
    exchanges, no joins."""
    from university_data_lakehouse_spark.operators.pipeline import (
        sample_split,
    )

    tree = _tree(_plan(sample_split(spark, sf_dir)))
    assert "Exchange" not in tree, tree


def test_boilerplate_prunes_columns_and_caches_span_stage(spark, sf_dir):
    """The repeated-span filter must read only (doc_id, text) from the
    parquet scan, keep its aggregates partial (map-side combine pairs
    around each shuffle), and tokenize the corpus ONCE — the span
    projection is cached, so at most one parquet scan of the text
    column feeds both the span-count aggregate and the join-back."""
    from university_data_lakehouse_spark.operators.dedup import (
        dedup_boilerplate,
    )

    df = dedup_boilerplate(spark, sf_dir)
    try:
        plan = _plan(df)
        # parse each ReadSchema struct and require the column set to
        # be exactly {doc_id, text} — a scan reading any extra column
        # (lang/source/n_chars) is NOT pruned, even without text
        import re as _re

        schemas = _re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        assert schemas, plan
        for struct in schemas:
            cols = {f.split(":")[0].strip()
                    for f in struct.split(",") if f.strip()}
            assert cols == {"doc_id", "text"}, (cols, plan)
        assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
        # the cached relation prints its child under BOTH scan sites;
        # distinct node ids = actual materializations (base + spans)
        import re as _re

        scan_ids = set(_re.findall(r"Scan parquet\s+\((\d+)\)",
                                   plan.split("\n\n", 1)[0]))
        assert len(scan_ids) <= 2, plan.split("\n\n", 1)[0]
    finally:
        spark.catalog.clearCache()


def test_vocab_topk_partial_agg_before_shuffle(spark, sf_dir):
    """r6: bigram counting must partial-aggregate map-side (two
    HashAggregate levels around one exchange) so the shuffle carries
    the per-partition vocabulary, not the exploded token stream; the
    rank window runs on the aggregated table; scan prunes to
    (lang, text)."""
    from university_data_lakehouse_spark.operators.text import text_vocab_topk

    plan = _plan(text_vocab_topk(spark, sf_dir))
    tree = _tree(plan)
    assert tree.count("Scan parquet") == 1, tree
    assert tree.count("HashAggregate") >= 2, tree  # partial + final
    scan_schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    cols = {c.split(":")[0] for c in scan_schema.split(",") if c}
    assert cols == {"lang", "text"}, scan_schema


def test_nearest_centroid_broadcasts_centroids(spark, sf_dir):
    """r6: the label-count-sized centroid table must broadcast into
    the assignment join (BroadcastNestedLoopJoin over the partitioned
    embeddings scan) — never a shuffle of the corpus against it."""
    from university_data_lakehouse_spark.operators.similarity import (
        emb_nearest_centroid,
    )

    tree = _tree(_plan(emb_nearest_centroid(spark, sf_dir)))
    assert "BroadcastNestedLoop" in tree, tree
    assert "CartesianProduct" not in tree, tree


def test_transition_matrix_single_user_shuffle(spark, sf_dir):
    """r6: one exchange for the lag window on user_id; the
    probability-normalization window runs on the |types|^2 count
    matrix (its exchange moves matrix-sized data, and the count
    aggregation partial-aggregates before its shuffle)."""
    from university_data_lakehouse_spark.operators.events import (
        events_transition_matrix,
    )

    tree = _tree(_plan(events_transition_matrix(spark, sf_dir)))
    assert tree.count("Scan parquet") == 1, tree
    assert tree.count("HashAggregate") >= 2, tree


def test_dv_read_broadcasts_vector_anti_join(spark, tmp_path):
    """r6: a deletion-vector read must anti-join the (tiny) DV table
    via broadcast — the corpus-sized scan never shuffles for its own
    delete filter."""
    from pyspark.sql import Row

    from university_data_lakehouse_spark.tables import TableCatalog

    cat = TableCatalog(str(tmp_path / "wh"))
    t = cat.table("dvplan")
    t.write(spark.createDataFrame([Row(id=i, val=str(i))
                                   for i in range(100)]))
    t.delete_where(spark, {"id": (10, 20)}, merge_on_read=True)
    tree = _tree(_plan(t.read(spark)))
    assert "BroadcastHashJoin" in tree and "LeftAnti" in tree, tree
    assert "SortMergeJoin" not in tree, tree


# ------------------------------------------------- r10 plan pins


@pytest.mark.parametrize(
    "key",
    ["text_gopher_rules", "text_c4_rules", "text_fineweb_rules",
     "emb_random_projection"],
)
def test_map_only_keys_have_zero_exchanges(spark, sf_dir, key):
    """r10 (VERDICT r9 item 9): the docstrings of the Gopher/C4/
    FineWeb gates and the JL projection claim zero shuffle — pin it:
    scan → project, no Join, and (for the text gates) the parquet
    scan pruned to (doc_id, text). r16: the per-row fold work is now
    scatter()ed off the single-row-group test scan, so ONE round-robin
    exchange (a no-op on production-width scans) is allowed — but any
    data-dependent (hash) exchange would still be a regression."""
    from university_data_lakehouse_spark.operators import similarity, text

    fn = {
        "text_gopher_rules": text.text_gopher_rules,
        "text_c4_rules": text.text_c4_rules,
        "text_fineweb_rules": text.text_fineweb_rules,
        "emb_random_projection": similarity.emb_random_projection,
    }[key]
    plan = _plan(fn(spark, sf_dir))
    tree = _tree(plan)
    assert tree.count("Exchange") <= 1, tree
    assert "hashpartitioning" not in tree, tree
    # rangepartitioning too (ADVICE r16): an accidental orderBy would
    # satisfy the hash-only ban while violating the map-only claim
    assert "rangepartitioning" not in tree, tree
    assert "Join" not in tree, tree
    if key.startswith("text_"):
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        assert schemas, plan
        for struct in schemas:
            cols = {f.split(":")[0].strip()
                    for f in struct.split(",") if f.strip()}
            assert cols == {"doc_id", "text"}, (cols, plan)


def test_psi_drift_single_events_scan(spark, sf_dir):
    """r10 (VERDICT r9 item 7): dq_psi_drift pre-aggregates to
    (event_type, hour bucket) in ONE pass and derives the midpoint
    split from the bucket table — the r9 shape's second full scan
    (raw min/max pass) must not reappear. Partial aggregation must
    survive (map-side combine before the bucket shuffle)."""
    from university_data_lakehouse_spark.operators import quality

    tree = _tree(_plan(quality.dq_psi_drift(spark, sf_dir)))
    assert tree.count("Scan parquet") == 1, tree
    assert tree.count("HashAggregate") >= 2, tree


def test_ivf_rp_probe_join_stays_broadcast_hash(spark, sf_dir):
    """r10: sim_knn_ivf_rp's probe join must stay a broadcast HASH
    join on the cell key (the tiny probes side broadcasts into the
    partitioned corpus) — never a cartesian/nested-loop product, and
    the re-rank must not resort to a sort-merge of the corpus."""
    from university_data_lakehouse_spark.operators.similarity import (
        sim_knn_ivf_rp,
    )

    try:
        tree = _tree(_plan(sim_knn_ivf_rp(spark, sf_dir)))
        assert "CartesianProduct" not in tree, tree
        assert "BroadcastNestedLoopJoin" not in tree, tree
        assert "BroadcastHashJoin" in tree, tree
    finally:
        spark.catalog.clearCache()


def test_benford_single_scan_digit_table(spark, sf_dir):
    """r10: dq_benford is one orders scan with map-side combine to a
    9-row digit table; the dim join against the generated digit range
    must broadcast (never shuffle the Range side as sort-merge)."""
    from university_data_lakehouse_spark.operators.quality import dq_benford

    tree = _tree(_plan(dq_benford(spark, sf_dir)))
    assert tree.count("Scan parquet") == 1, tree
    assert tree.count("HashAggregate") >= 2, tree
    assert "SortMergeJoin" not in tree, tree


def test_basket_affinity_topk_is_take_ordered(spark, sf_dir):
    """r7 (VERDICT r6 item 2): the top-K cut of the UNBOUNDED pairs
    table must execute as TakeOrderedAndProject (per-partition heap
    + driver merge of K rows) — never an unpartitioned row_number
    window, which would funnel every distinct co-occurring part pair
    through one task. The only window in the plan runs AFTER the
    K-row cut (its input is the TakeOrdered result, bounded at K)."""
    plan = _plan(olap.olap_basket_affinity(spark, sf_dir))
    tree = _tree(plan)
    assert "TakeOrderedAndProject" in tree, tree
    # the rank window must sit above the TakeOrdered cut, not below
    win_at = tree.find("Window")
    tko_at = tree.find("TakeOrderedAndProject")
    assert win_at != -1 and tko_at != -1
    # formatted tree prints operators top-down: parent (Window) first
    assert win_at < tko_at, tree


def test_basket_affinity_is_join_free_single_fact_grouping(spark, sf_dir):
    """r12 rewrite pin: the basket form must keep pair generation
    JOIN-FREE — one groupBy(l_orderkey) collect_set over the fact,
    then in-row explodes. No SortMergeJoin anywhere (the statistics
    joins against the K-row top cut are broadcasts), no join at all
    below the pair aggregation, and the exchange count stays at the
    rewrite's level (8; the old self-join plan carried 14)."""
    plan = _plan(olap.olap_basket_affinity(spark, sf_dir))
    tree = _tree(plan)
    assert "SortMergeJoin" not in tree, tree
    assert "CartesianProduct" not in tree, tree
    # every explode (Generate) node sits above a grouped-basket agg,
    # never above a join: pair fan-out is in-row
    assert tree.count("Generate") >= 2, tree
    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges <= 8, (n_exchanges, tree)


@pytest.mark.parametrize("which", ["narrow", "wide"])
def test_simhash_has_no_post_join_shuffle(spark, sf_dir, which):
    """Both simhash variants emit each pair exactly once from its
    FIRST agreeing band (a per-row int predicate on the signature
    ints that ride the join row), replacing the pair distinct() — so
    the plan must contain NO aggregate/exchange downstream of the
    band join: the only exchanges feed the join's two sides. A
    reappearing HashAggregate(keys=[id_a, id_b...]) means the
    distinct crept back and a multi-million-survivor shuffle with
    it (measured: 14.2s -> 5.4s narrow, the wide sibling ~1s)."""
    from university_data_lakehouse_spark.operators.dedup import (
        dedup_simhash,
        dedup_simhash_wide,
    )

    fn = dedup_simhash if which == "narrow" else dedup_simhash_wide
    tree = _tree(_plan(fn(spark, sf_dir)))
    join_pos = max(tree.find("SortMergeJoin"), tree.find("ShuffledHashJoin"),
                   tree.find("BroadcastHashJoin"))
    assert join_pos >= 0, tree
    above_join = tree[:join_pos]  # physical plans print root first
    assert "HashAggregate" not in above_join, tree
    assert "Exchange" not in above_join, tree


def test_simhash_incremental_no_distinct_single_fold_per_side(spark, sf_dir):
    """dedup_simhash_incremental shape (r14): the directional ingest
    flagger must carry NO post-join distinct (first-match band
    emission makes pairs exactly-once by construction) and exactly
    ONE signature vote fold per hash family per side — the Generate
    barrier in streaming.dedupe.simhash_tag stops pushdown
    substitution re-inlining the fold (it measured 6 folds/side
    without it)."""
    from university_data_lakehouse_spark.operators.dedup import (
        dedup_simhash_incremental,
    )

    df = dedup_simhash_incremental(spark, sf_dir)
    plan = _plan(df)
    tree = _tree(plan)
    assert "HashAggregate" not in tree, tree        # no distinct/groupBy
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("aggregate(") == 4, opt        # 2 families x 2 sides
    # the ingest gate is a scan-level filter, not a post-scan stage
    assert "md5" in plan.split("\n\n", 1)[0] or "PushedFilters" in plan


def test_simhash_wide_unified_stage_no_cache_two_folds_per_side(
        spark, sf_dir):
    """The r15 unification (VERDICT r14 item 3): dedup_simhash_wide's
    signature stage IS streaming.dedupe.simhash_tag — so its plan
    must carry no InMemoryRelation (the retired batch twin's two
    cache() barriers materialized a corpus-sized token/md5 cache per
    run) and exactly ONE vote fold per hash family per side, held by
    the tagger's Generate barrier exactly as in the incremental and
    streaming flaggers."""
    from university_data_lakehouse_spark.operators.dedup import (
        dedup_simhash_wide,
    )

    df = dedup_simhash_wide(spark, sf_dir)
    tree = _tree(_plan(df))
    assert "InMemoryRelation" not in tree, tree
    assert "InMemoryTableScan" not in tree, tree
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("aggregate(") == 4, opt        # 2 families x 2 sides
