"""Micro-DataFrame edge-case tests for r5 operators (SURVEY §5.2):
hand-built inputs where the expected output is checkable by hand —
conversion-window exclusion, weighted-copy arithmetic, repetition
run boundaries."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row


def _events_dir(spark, tmp_path, rows):
    d = str(tmp_path / "mini")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet"))
    return d


def _t(h):
    return dt.datetime(2024, 1, 1, h)


def test_funnel_windowed_excludes_out_of_window(spark, tmp_path):
    """User 1 converts inside both 72h windows; user 2's click lands
    AFTER the view window and must not count; user 3's purchase is
    inside the view window but outside the CLICK window — the funnel
    must anchor each stage on the PREVIOUS stage's timestamp."""
    from university_data_lakehouse_spark.operators.events import (
        events_funnel_windowed,
    )

    def at(hours):
        return dt.datetime(2024, 1, 1) + dt.timedelta(hours=hours)

    rows = [
        # user 1: view -> click(+1h) -> purchase(+2h): full conversion
        (1, at(0), 1, "view", 1.0, "{}"),
        (2, at(1), 1, "click", 1.0, "{}"),
        (3, at(2), 1, "purchase", 1.0, "{}"),
        # user 2: click 100h after view (> 72h): no click stage
        (4, at(0), 2, "view", 1.0, "{}"),
        (5, at(100), 2, "click", 1.0, "{}"),
        # user 3: click at +70h (in), purchase at +150h (>72h after
        # the click): click counts, purchase does not
        (6, at(0), 3, "view", 1.0, "{}"),
        (7, at(70), 3, "click", 1.0, "{}"),
        (8, at(150), 3, "purchase", 1.0, "{}"),
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = events_funnel_windowed(spark, d).collect()[0]
    assert (got.n_viewed, got.n_click_within, got.n_purchase_within) == (3, 2, 1)
    assert got.click_rate == 2 / 3 and got.purchase_rate == 1 / 2


def test_sample_weighted_copy_arithmetic(spark, tmp_path):
    """Every emitted copy count must be floor(w) or ceil(w) for its
    stratum, epochs must be contiguous 0..n_copies-1, and a weight of
    exactly 1.0 must emit exactly one copy per doc."""
    from university_data_lakehouse_spark.operators.pipeline import (
        WEIGHTED_EPOCHS,
        sample_weighted,
    )

    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [Row(doc_id=i, text="x", lang=lang, source="s", n_chars=1)
         for i, lang in enumerate(["en", "zh", "es", "fr", "de"] * 40)]
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = sample_weighted(spark, d).toPandas()
    for lang, (whole, frac_hex) in WEIGHTED_EPOCHS.items():
        sub = out[out.lang == lang]
        lo, hi = whole, whole + (frac_hex != "00000000")
        assert set(sub.n_copies) <= {lo, hi} - {0}, (lang, set(sub.n_copies))
        for _, grp in sub.groupby("doc_id"):
            assert sorted(grp.epoch) == list(range(grp.n_copies.iloc[0]))
    zh = out[out.lang == "zh"]
    assert len(zh) == 40 and set(zh.n_copies) == {1}   # weight exactly 1.0
