"""Planted-skew evidence (VERDICT r6 "Next round" #8): under a
hostile key distribution — one user owning ~10% of all events, one
order carrying thousands of distinct-part lines — the skew-sensitive
operators must still complete under AQE and produce HASH-IDENTICAL
results against the same DuckDB oracle replayed on the skewed dir.
Skew may slow a plan down; it must never change an answer."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "tools")

from tests.oracle_utils import compare  # noqa: E402


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    from synth_skew import synthesize

    out = str(tmp_path_factory.mktemp("skew"))
    stats = synthesize("/root/testdata/sf0.001", out,
                       hot_frac=0.1, hot_lines=1500)
    assert stats["hot_order_lines"] == 1500
    assert stats["hot_user_events"] >= 0.09 * stats["events_total"]
    return out


def test_skew_corpus_is_actually_skewed(spark, skew_dir):
    from university_data_lakehouse_spark.sources.loader import load_table

    ev = load_table(spark, skew_dir, "events")
    top = (ev.groupBy("user_id").count()
           .orderBy("count", ascending=False).first())
    assert top["count"] >= 0.09 * ev.count()
    li = load_table(spark, skew_dir, "lineitem")
    hot = (li.groupBy("l_orderkey").count()
           .orderBy("count", ascending=False).first())
    assert hot["count"] == 1500


def test_sessionize_skewed_oracle_parity(spark, skew_dir):
    from university_data_lakehouse_spark.operators.events import ORACLES
    from university_data_lakehouse_spark.operators.events import (
        events_sessionize,
    )

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    compare(events_sessionize(spark, skew_dir),
            ORACLES["events_sessionize"], skew_dir,
            "events_sessionize[skew]")


def test_first_last_touch_skewed_oracle_parity(spark, skew_dir):
    from university_data_lakehouse_spark.operators.events import ORACLES
    from university_data_lakehouse_spark.operators.events import (
        events_first_last_touch,
    )

    compare(events_first_last_touch(spark, skew_dir),
            ORACLES["events_first_last_touch"], skew_dir,
            "events_first_last_touch[skew]")


def test_basket_affinity_skewed_oracle_parity(spark, skew_dir):
    """The planted 1500-line order would contribute C(1500,2) ≈ 1.1M
    pairs through ONE join key; since r8 the BASKET_MAX_LINES cap
    drops it before pair generation (mirrored in the oracle), so the
    skewed dir must hash-match AND the mega-basket must be absent
    from the pair universe."""
    from university_data_lakehouse_spark.operators.olap import ORACLES
    from university_data_lakehouse_spark.operators.olap import (
        olap_basket_affinity,
    )

    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    compare(olap_basket_affinity(spark, skew_dir),
            ORACLES["olap_basket_affinity"], skew_dir,
            "olap_basket_affinity[skew]")


def test_basket_affinity_cap_drops_mega_basket(spark, skew_dir):
    """The capped universe must exclude the 1500-line order: its
    n_orders denominator is one less than the distinct order count,
    proving the cap executed (TPC-H-shaped baskets are <= 7 lines,
    so ONLY the planted order is dropped)."""
    from university_data_lakehouse_spark.operators.olap import (
        olap_basket_affinity,
    )
    from university_data_lakehouse_spark.sources.loader import load_table

    li = load_table(spark, skew_dir, "lineitem")
    all_orders = li.select("l_orderkey").distinct().count()
    row = olap_basket_affinity(spark, skew_dir).limit(1).collect()
    if row:
        n_in_support = round(row[0]["n_both"] / row[0]["support"])
        assert n_in_support == all_orders - 1


def test_c4_spans_skewed_oracle_parity(spark, skew_dir):
    """~30% of documents carry the same planted boilerplate span —
    one md5 key owning a third of the span table. The groupBy+min
    first-occurrence aggregation must absorb it (map-side partial
    agg) and the skewed dir must hash-match the oracle; the planted
    span must show up as real duplicates (every hot doc except the
    first occurrence reports >= 1 dup span)."""
    from university_data_lakehouse_spark.operators.dedup import (
        ORACLES,
        dedup_c4_spans,
    )
    from university_data_lakehouse_spark.sources.loader import load_table

    spark.catalog.clearCache()
    compare(dedup_c4_spans(spark, skew_dir), ORACLES["dedup_c4_spans"],
            skew_dir, "dedup_c4_spans[skew]")
    n_docs = load_table(spark, skew_dir, "documents").count()
    out = dedup_c4_spans(spark, skew_dir).toPandas()
    n_hot = int(n_docs * 0.3)
    # at least the hot docs after the first occurrence carry a dup
    assert (out["n_dup_spans"] > 0).sum() >= n_hot - 1
    spark.catalog.clearCache()
