"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` aggregate the per-module QUERIES /
ORACLES registries from ``university_data_lakehouse_spark.operators``.
Every key in SURVEY.md §2 maps to one entry here; oracle-less keys
(approximate / streaming ops) get the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from university_data_lakehouse_spark.session import tune_existing


# The driver's CORRECTNESS gate checks the first ~50 registry keys, and
# the registry exceeds that — so ordering is PRIORITY-BASED and the
# window ROTATES every round: keys whose last driver row is oldest
# register first, plus any key materially changed this round.  Keys
# displaced past the cap are green in CORRECTNESS_r01..r05 as standing
# proof, and EVERY key regardless of position passes the identical
# pytest oracle gate (tests/test_oracle_parity.py).
_PRIORITY_KEYS = (
    # r12 rotation. Lead: the 48 keys whose last driver row is
    # CORRECTNESS_r09 (2 rounds old, the invariant's limit) —
    # mechanically r09 green keys minus r10 minus r11, exactly the
    # r11 earmark. tools/window_check.py enforces this ordering.
    "dedup_c4_spans", "dedup_embedding_cosine", "dedup_embedding_lsh",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "dq_freshness", "dq_profile",
    "emb_random_projection", "events_asof_join", "events_funnel",
    "events_retention", "events_sessionize", "events_user_stats",
    "events_windowed_agg", "multimodal_alaw", "multimodal_audio_stats",
    "multimodal_avi", "multimodal_flac", "multimodal_frame_sample",
    "multimodal_meta", "multimodal_mjpeg", "multimodal_normalize",
    "multimodal_png", "multimodal_y4m", "olap_late_orders",
    "olap_local_supplier_volume", "olap_market_pivot",
    "olap_market_share", "olap_min_cost_supplier",
    "olap_price_percentiles", "olap_pricing_summary",
    "olap_revenue_forecast", "olap_rollup_revenue",
    "olap_running_revenue", "olap_shipping_priority",
    "olap_top_k_per_group", "sim_knn_bruteforce", "sim_knn_ivf",
    "sim_knn_ivfpq", "sim_knn_pq", "sim_knn_rp", "text_c4_rules",
    "text_fingerprint", "text_langid", "text_quality_score",
    "text_token_stats",
    # Slot 49: first driver row for the r11-built Layer I subband
    # decode — its DuckDB oracle (MPA_SUBBANDS_ORACLE) was pytest-
    # proven bit-exact in r11 before registration (tests/test_mpa.py).
    "multimodal_mpa_subbands",
    # Slot 50: olap_basket_affinity — materially changed this round
    # (the sf10 flag adjudication led to a basket-form rewrite: one
    # fact shuffle + in-row pair explode instead of distinct + window
    # cap + self-join), so it takes the spare slot per the changed-
    # keys-rotate-first discipline. The other two r11 sf10 flags
    # (events_active_users, silver_fact_lineitems) cleared with
    # 3-repeat medians and are unchanged; events_active_users is
    # r10-aged and leads the r13 mandatory set.
    "olap_basket_affinity",
    # r13 MUST lead with the 48 keys whose last driver row is
    # CORRECTNESS_r10 (mechanically r10 minus r11 minus r12 —
    # "chunk_documents", "corpus_build", "corpus_manifest",
    # "corpus_mixture_plan", "corpus_stats", "dedup_boilerplate",
    # "dedup_cluster_canonical", "dedup_cluster_canonical_fast",
    # "dedup_cluster_sizes", "dedup_name_fuzzy", "dq_value_outliers",
    # "emb_label_centroids", "emb_nearest_centroid",
    # "events_active_users", "events_anomaly",
    # "events_cohort_retention", "events_error_attribution",
    # "events_first_last_touch", "events_funnel_windowed",
    # "events_inter_event_gap", "events_json_props", "events_moving_avg",
    # "events_resample_1h", "events_rfm", "events_top_paths",
    # "events_transition_matrix", "events_value_histogram",
    # "events_value_percentiles", "events_value_quartiles",
    # "multimodal_decoded", "multimodal_features", "multimodal_gif",
    # "multimodal_mpeg1", "olap_avg_yearly", "olap_big_orders",
    # "olap_customer_distribution", "olap_disjunctive_revenue",
    # "olap_excess_suppliers", "olap_grouping_sets",
    # "olap_important_parts", "olap_nation_trade", "olap_repeat_customers",
    # "olap_revenue_mom", "sim_knn_ivf_rp", "text_entropy",
    # "text_gopher_rules", "text_tfidf_topk", "text_vocab_topk",
    # ) + 3 spare slots for r13-changed/new keys (registry is at
    # 147/150 capacity). tools/window_check.py verifies feasibility.
)


def _registries():
    """Collect (QUERIES, ORACLES) from every operator module, ordered
    priority-first (see _PRIORITY_KEYS) then module order."""
    from university_data_lakehouse_spark.operators import (  # noqa: PLC0415
        pipeline,
    )

    modules = [pipeline]
    for name in ("multimodal", "silver", "gold", "similarity", "olap",
                 "events", "dedup", "quality", "text"):
        try:
            mod = __import__(
                f"university_data_lakehouse_spark.operators.{name}",
                fromlist=[name],
            )
            modules.append(mod)
        except ImportError:
            continue
    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in modules:
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    ordered = {k: queries[k] for k in _PRIORITY_KEYS if k in queries}
    ordered.update((k, v) for k, v in queries.items() if k not in ordered)
    return ordered, oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_existing(spark)
    qs, _ = _registries()
    flagship = qs.get("gold_order_metrics", qs["silver_dim_customers"])
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = _registries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {k: wrap(fn) for k, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    _, oracles = _registries()
    return dict(oracles)
