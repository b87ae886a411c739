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
    # r7 rotation: the 20 r6-new keys below have NEVER had a driver
    # CORRECTNESS row (r6's window was spent on r4-aged keys) — they
    # lead this round per the r6 verdict. Four of them
    # (olap_basket_affinity, olap_customer_abc, text_vocab_topk,
    # corpus_mixture_plan) also changed materially in r7.
    "corpus_mixture_plan", "dedup_embedding_lsh_auto",
    "dq_freshness", "dq_value_outliers",
    "emb_label_centroids", "emb_nearest_centroid",
    "events_active_users", "events_first_last_touch",
    "events_inter_event_gap", "events_rfm", "events_top_paths",
    "events_transition_matrix", "events_value_histogram",
    "olap_basket_affinity", "olap_customer_abc",
    "olap_repeat_customers", "olap_revenue_mom",
    "text_entropy", "text_tfidf_topk", "text_vocab_topk",
    # new in r7 (stdlib LZW + palette decode).
    "multimodal_gif",
    # fill: 29 of the 47 keys whose last driver row is CORRECTNESS_r05;
    # the remaining 18 r5-aged keys (olap_priority_shipmode ..
    # text_repetition, see CORRECTNESS_r05.json) lead the r8 window.
    "chunk_documents", "corpus_build", "corpus_manifest", "corpus_stats",
    "dedup_boilerplate", "dedup_cluster_canonical",
    "dedup_cluster_canonical_fast", "dedup_cluster_sizes",
    "dedup_name_fuzzy", "dq_profile",
    "events_anomaly", "events_cohort_retention",
    "events_error_attribution", "events_funnel_windowed",
    "events_json_props", "events_moving_avg", "events_resample_1h",
    "events_value_percentiles", "events_value_quartiles",
    "multimodal_decoded", "multimodal_features",
    "olap_avg_yearly", "olap_big_orders", "olap_customer_distribution",
    "olap_disjunctive_revenue", "olap_excess_suppliers",
    "olap_grouping_sets", "olap_important_parts", "olap_nation_trade",
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
