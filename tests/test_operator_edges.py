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


def test_chunk_documents_boundary_arithmetic(spark, tmp_path):
    """Chunk counts at the exact boundaries: len <= SIZE is one chunk;
    len = SIZE + 1 needs a second (tail) chunk of SIZE - STRIDE + 1
    chars; len = SIZE + STRIDE lands exactly on the last stride (no
    extra chunk); every non-final chunk is exactly SIZE chars and
    consecutive chunks overlap by SIZE - STRIDE."""
    from university_data_lakehouse_spark.operators.pipeline import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        chunk_documents,
    )

    lens = [1, CHUNK_SIZE - 1, CHUNK_SIZE, CHUNK_SIZE + 1,
            CHUNK_SIZE + CHUNK_STRIDE, CHUNK_SIZE + CHUNK_STRIDE + 1,
            CHUNK_SIZE + 3 * CHUNK_STRIDE]
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [Row(doc_id=i, text="a" * n, lang="en", source="s", n_chars=n)
         for i, n in enumerate(lens)]
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = chunk_documents(spark, d).toPandas()
    expect_chunks = [1, 1, 1, 2, 2, 3, 4]
    for i, n in enumerate(lens):
        sub = out[out.doc_id == i].sort_values("chunk_idx")
        assert list(sub.chunk_idx) == list(range(expect_chunks[i])), (i, n)
        assert set(sub.n_chunks) == {expect_chunks[i]}
        # non-final chunks are full SIZE; the tail covers through n
        assert all(sub.chunk_len.iloc[:-1] == CHUNK_SIZE)
        last_start = (expect_chunks[i] - 1) * CHUNK_STRIDE
        assert sub.chunk_len.iloc[-1] == n - last_start
    # len = SIZE+1: tail chunk is SIZE - STRIDE + 1 chars
    tail = out[(out.doc_id == 3) & (out.chunk_idx == 1)].chunk_len.iloc[0]
    assert tail == CHUNK_SIZE - CHUNK_STRIDE + 1


def test_sample_split_deterministic_and_disjoint(spark, tmp_path):
    """The split is a pure function of doc_id (same assignment on
    re-run and after corpus growth), every doc lands in exactly one
    split, and observed fractions sit near the 90/5/5 thresholds."""
    from university_data_lakehouse_spark.operators.pipeline import sample_split

    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)

    def write(n):
        spark.createDataFrame(
            [Row(doc_id=i, text="x", lang="en", source="s", n_chars=1)
             for i in range(n)]
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    write(500)
    first = sample_split(spark, d).toPandas().set_index("doc_id")["split"]
    write(2000)   # corpus grew: earlier docs must not migrate
    grown = sample_split(spark, d).toPandas().set_index("doc_id")["split"]
    assert (grown.loc[first.index] == first).all()
    frac = grown.value_counts(normalize=True)
    assert 0.85 < frac.get("train", 0) < 0.95
    assert 0.02 < frac.get("validation", 0) < 0.08
    assert 0.02 < frac.get("test", 0) < 0.08


def test_dedup_boilerplate_span_arithmetic(spark, tmp_path):
    """Docs 0 and 1 share their first 8-token span (boilerplate); doc
    2 is unique; doc 3 is shorter than one span (0 spans, fraction
    0.0, never flagged). The partial tail span never counts."""
    from university_data_lakehouse_spark.operators.dedup import (
        dedup_boilerplate,
    )

    header = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        Row(doc_id=0, text=header + " one two three four five six seven eight",
            lang="en", source="s", n_chars=1),
        Row(doc_id=1, text=header + " nine ten eleven twelve th fo fi si",
            lang="en", source="s", n_chars=1),
        Row(doc_id=2, text="uniq1 uniq2 uniq3 uniq4 uniq5 uniq6 uniq7 uniq8 tail",
            lang="en", source="s", n_chars=1),
        Row(doc_id=3, text="only seven tokens here not even eight",
            lang="en", source="s", n_chars=1),
    ]
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    out = dedup_boilerplate(spark, d).toPandas().set_index("doc_id")
    assert out.loc[0].n_spans == 2 and out.loc[0].n_boilerplate == 1
    assert out.loc[0].boiler_fraction == 0.5
    assert bool(out.loc[0].is_boilerplate_doc)        # 0.5 >= tau
    assert out.loc[1].n_boilerplate == 1
    assert out.loc[2].n_spans == 1 and out.loc[2].n_boilerplate == 0
    assert not bool(out.loc[2].is_boilerplate_doc)
    assert out.loc[3].n_spans == 0
    assert out.loc[3].boiler_fraction == 0.0
    assert not bool(out.loc[3].is_boilerplate_doc)


def test_transition_matrix_counts_and_probs(spark, tmp_path):
    """Hand-built sequences: user 1 goes view->click->view, user 2
    view->click. Expected pairs: view->click x2, click->view x1; the
    first event of each user contributes no pair. Probabilities
    normalize per from_type."""
    from university_data_lakehouse_spark.operators.events import (
        events_transition_matrix,
    )

    rows = [
        (1, _t(0), 1, "view", 1.0, "{}"),
        (2, _t(1), 1, "click", 1.0, "{}"),
        (3, _t(2), 1, "view", 1.0, "{}"),
        (4, _t(0), 2, "view", 1.0, "{}"),
        (5, _t(1), 2, "click", 1.0, "{}"),
    ]
    d = _events_dir(spark, tmp_path, rows)
    out = {(r.from_type, r.to_type): r
           for r in events_transition_matrix(spark, d).collect()}
    assert out[("view", "click")].n_transitions == 2
    assert out[("click", "view")].n_transitions == 1
    assert out[("view", "click")].probability == 1.0
    assert out[("click", "view")].probability == 1.0
    assert ("view", "view") not in out and len(out) == 2


def test_value_histogram_bin_edges(spark, tmp_path):
    """Values exactly on a bin edge belong to the HIGHER bin
    (floor(25/25) = 1); negatives floor downward (-0.5 -> bin -1)."""
    from university_data_lakehouse_spark.operators.events import (
        HIST_BIN_WIDTH,
        events_value_histogram,
    )

    assert HIST_BIN_WIDTH == 25.0
    rows = [
        (1, _t(0), 1, "view", 0.0, "{}"),
        (2, _t(0), 1, "view", 24.999, "{}"),
        (3, _t(0), 1, "view", 25.0, "{}"),
        (4, _t(0), 1, "view", -0.5, "{}"),
    ]
    d = _events_dir(spark, tmp_path, rows)
    out = {r.bin_id: r for r in events_value_histogram(spark, d).collect()}
    assert out[0].n_events == 2 and out[0].max_value == 24.999
    assert out[1].n_events == 1 and out[1].bin_low == 25.0
    assert out[-1].n_events == 1 and out[-1].bin_low == -25.0


def test_vocab_topk_rank_and_tiebreak(spark, tmp_path):
    """'a b' appears 3x, 'b a' 2x; ties between distinct once-seen
    bigrams order alphabetically; ranks are per-language."""
    from university_data_lakehouse_spark.operators.text import (
        text_vocab_topk,
    )

    rows = [
        Row(doc_id=0, text="a b a b a b", lang="en", source="s", n_chars=1),
        Row(doc_id=1, text="z y", lang="fr", source="s", n_chars=1),
        Row(doc_id=2, text="z w", lang="fr", source="s", n_chars=1),
    ]
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    out = text_vocab_topk(spark, d).toPandas()
    en = out[out.lang == "en"].sort_values("vocab_rank")
    # "a b a b a b": bigrams a-b, b-a, a-b, b-a, a-b
    assert list(en.bigram) == ["a b", "b a"]
    assert list(en.n_occurrences) == [3, 2]
    fr = out[out.lang == "fr"].sort_values("vocab_rank")
    assert list(fr.bigram) == ["z w", "z y"]  # tie broken alphabetically
    assert list(fr.vocab_rank) == [1, 2]


def _orders_dir(spark, tmp_path, rows):
    d = str(tmp_path / "mini_orders")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet"))
    return d


def test_repeat_customers_year_overlap(spark, tmp_path):
    """1994 actives {1, 2}; 1995 actives {2, 3}: repeat(1994) = 1 of 2;
    1995's only possible repeat year (1996) is empty -> 0. A customer
    with two orders in one year still counts once (distinct)."""
    from university_data_lakehouse_spark.operators.olap import (
        olap_repeat_customers,
    )

    d4 = dt.datetime(1994, 6, 1)
    d5 = dt.datetime(1995, 6, 1)
    rows = [
        (1, 1, "F", 10.0, d4, "1-URGENT"),
        (2, 1, "F", 10.0, d4, "1-URGENT"),   # same cust+year: one active
        (3, 2, "F", 10.0, d4, "1-URGENT"),
        (4, 2, "F", 10.0, d5, "1-URGENT"),
        (5, 3, "F", 10.0, d5, "1-URGENT"),
    ]
    d = _orders_dir(spark, tmp_path, rows)
    out = {r.order_year: r for r in olap_repeat_customers(spark, d).collect()}
    assert out[1994].n_active == 2 and out[1994].n_repeat == 1
    assert out[1994].repeat_rate == 0.5
    assert out[1995].n_active == 2 and out[1995].n_repeat == 0


def test_revenue_mom_first_month_null(spark, tmp_path):
    """First month has NULL prev/growth; growth arithmetic is exact on
    round decimal inputs (100 -> 150 = +0.5)."""
    from university_data_lakehouse_spark.operators.olap import (
        olap_revenue_mom,
    )

    rows = [
        (1, 1, "F", 100.0, dt.datetime(1994, 1, 15), "1-URGENT"),
        (2, 1, "F", 150.0, dt.datetime(1994, 2, 15), "1-URGENT"),
    ]
    d = _orders_dir(spark, tmp_path, rows)
    out = sorted(olap_revenue_mom(spark, d).collect(), key=lambda r: r.month)
    assert out[0].prev_month_revenue is None and out[0].mom_growth is None
    assert out[1].prev_month_revenue == 100.0
    assert out[1].mom_growth == 0.5


def test_label_centroids_exact_mean(spark, tmp_path):
    """Two vectors in one label: centroid is the exact componentwise
    mean; a single-vector label reproduces its vector."""
    from university_data_lakehouse_spark.operators.similarity import (
        emb_label_centroids,
    )

    d = str(tmp_path / "emb")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 6.0], 0), (3, [0.5, -0.25], 1)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    out = {(r.label, r.pos): r.centroid
           for r in emb_label_centroids(spark, d).collect()}
    assert out[(0, 1)] == 2.0 and out[(0, 2)] == 4.0
    assert out[(1, 1)] == 0.5 and out[(1, 2)] == -0.25


def test_nearest_centroid_confusion(spark, tmp_path):
    """Label 0's centroid is +x, label 1's is +y. A label-1 outlier
    pointing at +x must be assigned to 0 (one off-diagonal cell); the
    rest of the matrix is diagonal."""
    from university_data_lakehouse_spark.operators.similarity import (
        emb_nearest_centroid,
    )

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
        (5, [1.0, 0.05], 1),   # mislabeled: cosine to centroid 0 wins
    ]
    d = str(tmp_path / "emb")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    out = {(r.label, r.assigned_label): r.n_vectors
           for r in emb_nearest_centroid(spark, d).collect()}
    assert out[(0, 0)] == 2
    assert out[(1, 0)] == 1
    # the +y pair beats label 1's outlier-dragged centroid regardless:
    assert out[(1, 1)] == 2
    assert (0, 1) not in out


def test_rfm_scores_and_recency(spark, tmp_path):
    """Four users with strictly increasing recency/frequency/monetary
    get distinct quartiles 1..4 on every axis; recency_days counts
    whole days back from the corpus max date."""
    from university_data_lakehouse_spark.operators.events import events_rfm

    rows, eid = [], 0
    for u in range(1, 5):
        for k in range(u):          # user u has u events
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, u, 12),
                         u, "view", float(10 * u), "{}"))
    d = _events_dir(spark, tmp_path, rows)
    out = {r.user_id: r for r in events_rfm(spark, d).collect()}
    # corpus max date is 2024-01-04 (user 4)
    assert [out[u].recency_days for u in (1, 2, 3, 4)] == [3, 2, 1, 0]
    for u in (1, 2, 3, 4):
        assert out[u].r_score == u and out[u].f_score == u
        assert out[u].m_score == u
        assert out[u].segment == u * 111
    assert out[4].frequency == 4 and out[4].monetary == 160.0


def test_first_last_touch_boundaries(spark, tmp_path):
    """Touches strictly before the FIRST purchase attribute; the
    purchase-simultaneous event and later events do not. A user whose
    first purchase has no prior touch is omitted."""
    from university_data_lakehouse_spark.operators.events import (
        events_first_last_touch,
    )

    rows = [
        # user 1: view(0) click(1) purchase(2) view(3) purchase(4)
        (1, _t(0), 1, "view", 1.0, "{}"),
        (2, _t(1), 1, "click", 1.0, "{}"),
        (3, _t(2), 1, "purchase", 1.0, "{}"),
        (4, _t(3), 1, "view", 1.0, "{}"),
        (5, _t(4), 1, "purchase", 1.0, "{}"),
        # user 2: click at the same instant as the purchase -> no touch
        (6, _t(5), 2, "click", 1.0, "{}"),
        (7, _t(5), 2, "purchase", 1.0, "{}"),
        # user 3: purchase only
        (8, _t(6), 3, "purchase", 1.0, "{}"),
    ]
    d = _events_dir(spark, tmp_path, rows)
    out = {r.user_id: r for r in events_first_last_touch(spark, d).collect()}
    assert set(out) == {1}
    assert out[1].first_touch == "view" and out[1].last_touch == "click"
    assert out[1].n_touches == 2 and out[1].t_purchase == _t(2)


def test_top_paths_order_and_cap(spark, tmp_path):
    """Paths build in (ts, event_id) order, split on the session gap,
    and truncate at PATH_MAX_LEN steps; ranking breaks count ties
    alphabetically."""
    from university_data_lakehouse_spark.operators.events import (
        PATH_MAX_LEN,
        events_top_paths,
    )

    def at(minutes):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)

    rows = [
        # user 1, session 1: view>click (5 min apart); a 2-hour
        # silence then opens session 2: view
        (1, at(0), 1, "view", 1.0, "{}"),
        (2, at(5), 1, "click", 1.0, "{}"),
        (3, at(125), 1, "view", 1.0, "{}"),
        # user 2: one session view>click (same path as user 1's first)
        (4, at(0), 2, "view", 1.0, "{}"),
        (5, at(0), 2, "click", 1.0, "{}"),  # same ts: event_id orders
        # user 3: a 10-step session (1 min apart) truncates to
        # PATH_MAX_LEN
        *[(6 + k, at(300 + k), 3, "view", 1.0, "{}")
          for k in range(10)],
    ]
    d = _events_dir(spark, tmp_path, rows)
    out = {r.path: r for r in events_top_paths(spark, d).collect()}
    assert out["view>click"].n_sessions == 2
    assert out["view>click"].path_rank == 1
    assert out["view"].n_sessions == 1
    long_path = ">".join(["view"] * PATH_MAX_LEN)
    assert out[long_path].n_sessions == 1  # truncated, not 10 steps
    assert len(out) == 3


def test_tfidf_scores_and_rank(spark, tmp_path):
    """Corpus-wide terms get idf = ln(1) = 0; a doc-unique term in a
    2-doc corpus scores tf * ln(2); repeated terms multiply tf."""
    import math

    from university_data_lakehouse_spark.operators.text import (
        text_tfidf_topk,
    )

    rows = [
        Row(doc_id=0, text="common rare rare", lang="en", source="s",
            n_chars=1),
        Row(doc_id=1, text="common other", lang="en", source="s", n_chars=1),
    ]
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    out = {(r.doc_id, r.term): r for r in text_tfidf_topk(spark, d).collect()}
    ln2 = round(math.log(2.0), 6)
    assert out[(0, "rare")].tfidf == round(2 * math.log(2.0), 6)
    assert out[(0, "rare")].kw_rank == 1 and out[(0, "rare")].tf == 2
    assert out[(0, "common")].tfidf == 0.0 and out[(0, "common")].df == 2
    assert out[(1, "other")].tfidf == ln2
    assert out[(1, "other")].kw_rank == 1


def test_inter_event_gap_partitioning(spark, tmp_path):
    """Gaps pair consecutive SAME-type events of the SAME user: the
    interleaved click never contributes to view gaps, and the other
    user's view stream is independent."""
    from university_data_lakehouse_spark.operators.events import (
        events_inter_event_gap,
    )

    def at(minutes):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)

    rows = [
        (1, at(0), 1, "view", 1.0, "{}"),
        (2, at(5), 1, "click", 1.0, "{}"),   # interleaved other type
        (3, at(10), 1, "view", 1.0, "{}"),   # view gap = 10 min
        (4, at(0), 2, "view", 1.0, "{}"),
        (5, at(30), 2, "view", 1.0, "{}"),   # view gap = 30 min
    ]
    d = _events_dir(spark, tmp_path, rows)
    out = {r.event_type: r for r in events_inter_event_gap(spark, d).collect()}
    assert "click" not in out                   # one click: no gap
    v = out["view"]
    assert v.n_gaps == 2
    assert v.mean_gap_s == (600 + 1800) / 2
    assert v.p50_gap_s == (600 + 1800) / 2      # interpolated median
    assert v.p90_gap_s == 600 + (1800 - 600) * 0.9


def test_value_outliers_tukey_fences(spark, tmp_path):
    """A far-out order is the only fence violation; a tight group has
    zero outliers; fences replay the q1/q3 +- 1.5 IQR arithmetic."""
    from university_data_lakehouse_spark.operators.quality import (
        dq_value_outliers,
    )

    d4 = dt.datetime(1994, 6, 1)
    rows = (
        [(i, 1, "F", 100.0 + i, d4, "1-URGENT") for i in range(9)]
        + [(9, 1, "F", 10000.0, d4, "1-URGENT")]   # the outlier
        + [(10 + i, 1, "F", 50.0, d4, "2-HIGH") for i in range(4)]
    )
    d = _orders_dir(spark, tmp_path, rows)
    out = {r.priority: r for r in dq_value_outliers(spark, d).collect()}
    u = out["1-URGENT"]
    assert u.n_rows == 10 and u.n_outliers == 1
    assert u.outlier_frac == 0.1
    h = out["2-HIGH"]
    assert h.n_outliers == 0 and h.q1 == h.q3 == 50.0
    assert h.lo == h.hi == 50.0


def test_entropy_hand_values(spark, tmp_path):
    """'aaaa' has entropy 0; 'ab' has exactly 1 bit = ln 2 nats; a
    4-char uniform alphabet gives ln 4."""
    import math

    from university_data_lakehouse_spark.operators.text import text_entropy

    rows = [
        Row(doc_id=0, text="aaaa", lang="en", source="s", n_chars=4),
        Row(doc_id=1, text="ab", lang="en", source="s", n_chars=2),
        Row(doc_id=2, text="abcd", lang="en", source="s", n_chars=4),
    ]
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in text_entropy(spark, d).collect()}
    assert out[0].char_entropy == 0.0 and out[0].n_distinct_chars == 1
    assert out[1].char_entropy == round(math.log(2), 6)
    assert out[2].char_entropy == round(math.log(4), 6)


def test_mixture_plan_weights(spark, tmp_path):
    """Weight = target/actual capped at MIXTURE_MAX_UPSAMPLE; a lang
    outside the target config gets weight 0."""
    from university_data_lakehouse_spark.operators.pipeline import (
        MIXTURE_MAX_UPSAMPLE,
        corpus_mixture_plan,
    )

    rows = (
        [Row(doc_id=i, text="tok " * 10, lang="en", source="s", n_chars=1)
         for i in range(8)]
        + [Row(doc_id=100, text="tok " * 10, lang="zh", source="s", n_chars=1)]
        + [Row(doc_id=200, text="tok " * 10, lang="xx", source="s", n_chars=1)]
    )
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    out = {r.lang: r for r in corpus_mixture_plan(spark, d).collect()}
    assert out["en"].actual_share == 0.8
    assert out["en"].mixture_weight == 0.40 / 0.8
    # zh: target 0.20, actual 0.1 -> 2.0; under the 5.0 cap
    assert out["zh"].mixture_weight == 2.0
    assert out["xx"].target_share == 0.0
    assert out["xx"].mixture_weight == 0.0
    assert MIXTURE_MAX_UPSAMPLE == 5.0


def test_customer_abc_pareto_cuts(spark, tmp_path):
    """Four customers with revenues 60/20/15/5 (total 100): cum
    shares 0.60/0.80/0.95/1.00 — the boundary customers land IN the
    class their cumulative share closes (<= semantics)."""
    from university_data_lakehouse_spark.operators.olap import (
        olap_customer_abc,
    )

    d4 = dt.datetime(1996, 6, 1)
    rows = [
        (1, 1, "F", 60.0, d4, "1-URGENT"),
        (2, 2, "F", 20.0, d4, "1-URGENT"),
        (3, 3, "F", 15.0, d4, "1-URGENT"),
        (4, 4, "F", 5.0, d4, "1-URGENT"),
    ]
    d = _orders_dir(spark, tmp_path, rows)
    out = {r.custkey: r for r in olap_customer_abc(spark, d).collect()}
    assert out[1].abc_class == "A" and out[1].cum_revenue_share == 0.60
    assert out[2].abc_class == "A" and out[2].cum_revenue_share == 0.80
    assert out[3].abc_class == "B" and out[3].cum_revenue_share == 0.95
    assert out[4].abc_class == "C" and out[4].cum_revenue_share == 1.00


def test_active_users_window_arithmetic(spark, tmp_path):
    """User 1 active on day 0, user 2 on day 5: day-5 DAU counts only
    user 2, WAU (7d) counts both, and a day-8 report (activity that
    day) keeps user 1 in MAU but drops them from WAU (offset 8 > 6)."""
    from university_data_lakehouse_spark.operators.events import (
        events_active_users,
    )

    def on(day):
        return dt.datetime(2024, 1, 1 + day, 12)

    rows = [
        (1, on(0), 1, "view", 1.0, "{}"),
        (2, on(5), 2, "view", 1.0, "{}"),
        (3, on(8), 2, "view", 1.0, "{}"),
    ]
    d = _events_dir(spark, tmp_path, rows)
    out = {r.report_day.day: r for r in
           events_active_users(spark, d).collect()}
    assert set(out) == {1, 6, 9}             # only days with activity
    assert (out[1].dau, out[1].wau, out[1].mau) == (1, 1, 1)
    assert (out[6].dau, out[6].wau, out[6].mau) == (1, 2, 2)
    assert (out[9].dau, out[9].wau, out[9].mau) == (1, 1, 2)
    assert out[9].stickiness == 0.5


def test_basket_affinity_counts_and_lift(spark, tmp_path):
    """Three orders: {1,2}, {1,2}, {1,3}. Pair (1,2) co-occurs twice;
    lift(1,2) = (2*3)/(3*2) = 1.0; pair (1,3) once with lift
    (1*3)/(3*1) = 1.0; pair (2,3) never co-occurs (absent). A
    duplicate line of the same part counts once (distinct)."""
    from university_data_lakehouse_spark.operators.olap import (
        olap_basket_affinity,
    )

    d = str(tmp_path / "mini_li")
    os.makedirs(d, exist_ok=True)
    rows = [
        (10, 1), (10, 2), (10, 2),    # duplicate part line
        (20, 1), (20, 2),
        (30, 1), (30, 3),
    ]
    spark.createDataFrame(
        [(o, p, 1, 1.0, 0.0, dt.datetime(1996, 1, 1)) for o, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_quantity double, l_discount double, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    out = {(r.pa, r.pb): r for r in olap_basket_affinity(spark, d).collect()}
    assert out[(1, 2)].n_both == 2 and out[(1, 2)].pair_rank == 1
    assert out[(1, 2)].lift == 1.0 and out[(1, 2)].support == 2 / 3
    assert out[(1, 3)].n_both == 1 and out[(1, 3)].lift == 1.0
    assert (2, 3) not in out and len(out) == 2


def test_mixture_plan_zero_token_lang(spark, tmp_path):
    """r6 ADVICE: a language whose docs all tokenize to zero tokens
    under the [a-z0-9]+ tokenizer must get weight MIXTURE_MAX_UPSAMPLE
    if targeted and 0.0 if untargeted — never NaN (and never the cap
    via Spark's LEAST(NaN, cap) = cap trap)."""
    import math

    from university_data_lakehouse_spark.operators.pipeline import (
        MIXTURE_MAX_UPSAMPLE,
        corpus_mixture_plan,
    )

    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    rows = (
        [Row(doc_id=i, text="hello world", lang="en", source="s",
             n_chars=11) for i in range(5)]
        # zh is IN MIXTURE_TARGETS; CJK text has no [a-z0-9] runs
        + [Row(doc_id=100 + i, text="你好世界",
               lang="zh", source="s", n_chars=4) for i in range(5)]
        # xx is NOT targeted and also tokenizes to zero
        + [Row(doc_id=200 + i, text="!!! ???", lang="xx", source="s",
               n_chars=7) for i in range(3)]
    )
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    out = {r["lang"]: r for r in corpus_mixture_plan(spark, d).collect()}
    assert out["zh"]["n_tokens"] == 0
    assert out["zh"]["mixture_weight"] == MIXTURE_MAX_UPSAMPLE
    assert out["xx"]["mixture_weight"] == 0.0
    for r in out.values():
        assert not math.isnan(r["mixture_weight"]), r


def test_ks_drift_hand_values(spark, tmp_path):
    """Hand-checked two-sample KS: ref half {1,2,3,4}, current half
    {3,4,5,6} → D = max gap 0.5 (at x=2: F_ref=0.5, F_cur=0); a
    type whose current half shifts completely (200×0 → 200×1) flags
    drift (D=1 > 1.358·√(400/40000) ≈ 0.1358); oracle compare on the
    same fixture pins the cross-engine CDF arithmetic."""
    from university_data_lakehouse_spark.operators.quality import (
        ORACLES,
        dq_ks_drift,
    )
    from tests.oracle_utils import compare

    def at(h):
        return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)

    rows = []
    eid = 0
    for v in [1.0, 2.0, 3.0, 4.0]:
        eid += 1
        rows.append((eid, at(0), 1, "small", v, "{}"))
    for v in [3.0, 4.0, 5.0, 6.0]:
        eid += 1
        rows.append((eid, at(9), 1, "small", v, "{}"))
    for i in range(200):
        eid += 1
        rows.append((eid, at(0), 2, "shifted", 0.0, "{}"))
        eid += 1
        rows.append((eid, at(9), 2, "shifted", 1.0, "{}"))
    # a type emitted ONLY after the midpoint: n_ref = 0 — the bare
    # division would throw under ANSI / NULL out in DuckDB; the
    # operator must report D = 1.0, NULL threshold, drift_flag = 1
    for v in [2.0, 4.0, 8.0]:
        eid += 1
        rows.append((eid, at(9), 3, "brand_new", v, "{}"))
    import pandas as pd

    d = str(tmp_path / "mini")
    os.makedirs(d, exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    # single parquet FILE (not a Spark part-dir) so the oracle's
    # read_parquet sees the same table
    pdf.astype({"event_id": "int64", "user_id": "int64"}).to_parquet(
        os.path.join(d, "events.parquet"))
    out = {r["event_type"]: r for r in dq_ks_drift(spark, d).collect()}
    assert out["small"]["n_ref"] == 4 and out["small"]["n_cur"] == 4
    assert out["small"]["ks_stat"] == 0.5
    assert out["small"]["drift_flag"] == 0     # threshold ~0.96 at n=4
    assert out["shifted"]["ks_stat"] == 1.0
    assert out["shifted"]["drift_flag"] == 1
    assert out["brand_new"]["n_ref"] == 0
    assert out["brand_new"]["ks_stat"] == 1.0
    assert out["brand_new"]["ks_threshold"] is None
    assert out["brand_new"]["drift_flag"] == 1
    compare(dq_ks_drift(spark, d), ORACLES["dq_ks_drift"], d,
            name="dq_ks_drift@hand")


def test_gopher_rules_hostile_text_cross_engine(spark, tmp_path):
    """text_gopher_rules must bit-match its DuckDB oracle on the
    whitespace/regex corner cases the two engines disagree on by
    default: \\x0B (in Java's \\s, not RE2's — hence the explicit
    WS_RE class), CRLF line endings (Java's $ matches before a
    trailing \\r; \\z doesn't), unicode ellipsis/bullets, and
    zero-word documents (NULL-ratio propagation)."""
    import pandas as pd

    from university_data_lakehouse_spark.operators.text import (
        ORACLES,
        text_gopher_rules,
    )
    from tests.oracle_utils import compare

    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    rows = [
        (1, "the quick brown fox \x0bjumps over the lazy dog and "
            "that is to be of have with " * 5, "en"),
        (2, "- bullet one...\r\n- bullet two…\r\n* three\r\n• four", "en"),
        (3, "#### ## # hash #soup... ... .... ....... the of and", "en"),
        (4, "", "en"),                      # zero words, zero chars
        (5, "word\tword2\fword3\rword4\nword5  word6", "en"),
        (6, "ends with dots...\nends with …\nplain line", "en"),
        (7, "\x0b\x0b\x0b", "en"),          # whitespace-only
        (8, "ends with cr dots...\r\nnext line", "en"),  # $ vs \z trap
    ]
    pd.DataFrame(
        [(i, t, lg, "s", len(t)) for i, t, lg in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(os.path.join(d, "documents.parquet"))
    compare(text_gopher_rules(spark, d), ORACLES["text_gopher_rules"],
            d, name="text_gopher_rules@hostile")


def test_gopher_rules_hand_values(spark, tmp_path):
    """Hand-checked rule arithmetic: a clean 60-word English doc
    passes all 7 rules; a 10-word doc fails only the word-count
    floor; a bullet-heavy doc trips the bullet-ratio rule."""
    from university_data_lakehouse_spark.operators.text import (
        text_gopher_rules,
    )

    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    clean = ("the cat and the dog have that to be of with good "
             "word here more text " * 4).strip()          # 64 words
    # 10 words, 38 chars -> mean word len 3.8 (in range); only the
    # 50-word floor fails
    short = "the cats and then dogs have that here with good"
    bullets = "\n".join("- item %d" % i for i in range(10))
    rows = [
        Row(doc_id=1, text=clean, lang="en", source="s", n_chars=1),
        Row(doc_id=2, text=short, lang="en", source="s", n_chars=1),
        Row(doc_id=3, text=bullets, lang="en", source="s", n_chars=1),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in text_gopher_rules(spark, d).collect()}
    assert out[1]["keep"] == 1 and out[1]["rules_passed"] == 7
    assert out[2]["keep"] == 0 and out[2]["rules_passed"] == 6
    assert out[2]["n_words"] == 10
    # every line is a bullet -> ratio 1.0 > 0.9; word count also fails
    assert out[3]["bullet_ratio"] == 1.0
    assert out[3]["keep"] == 0


def test_c4_rules_hostile_text_cross_engine(spark, tmp_path):
    """text_c4_rules must bit-match its DuckDB oracle on the same
    cross-engine regex traps its Gopher twin is pinned on — and the
    fixture is mutation-sensitive: doc 3 ends in NEL (\\u0085, a Java
    line terminator), so replacing \\z with $ in the Spark expression
    flips its kept-line count (Java's $ matches before a final NEL;
    RE2's does not); doc 2 straddles the 5-word line floor on a \\x0B
    separator, so replacing the explicit WS_RE class with \\s in the
    ORACLE (RE2's \\s excludes \\x0B; Java's \\s equals WS_RE exactly,
    so the Spark side has no such mutation to catch) flips its
    kept-line count.  Hand-computed rows back the compare() so a
    symmetrical two-sided mutation is caught too."""
    import pandas as pd

    from university_data_lakehouse_spark.operators.text import (
        ORACLES,
        text_c4_rules,
    )
    from tests.oracle_utils import compare

    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    rows = [
        # CRLF page: after the \n split every non-final line keeps a
        # trailing \r that C4_TERMINAL_RE's [ \t\r]* must absorb.
        (1, "This is line one okay.\r\nThis line has five words!\r\n"
            "short.\r\n"),
        # 5 words iff \x0B splits (WS_RE does; RE2 \s does not).
        (2, "one two three four\x0bfive."),
        # NEL-terminated: kept iff \z is weakened to Java's $.
        (3, "alpha beta gamma delta works fine.\u0085"),
        # Quote-terminated kept line; 3 sentences -> page kept.
        (4, "First sentence here is good.\n"
            'He said "five words are here."\n'
            "And a third one ends now!"),
        # Would pass, but carries a curly brace.
        (5, "This would pass all rules fine. Another sentence here "
            "too! A third sentence with words? But it has a { brace."),
        # lorem ipsum casing trap.
        (6, "LoReM IpSuM dolor sit amet words. More sentence here is "
            "fine! Third sentence goes right here."),
        (7, ""),                                     # empty page
        (8, "Only two sentences right here okay. "
            "And the second one now!"),              # < 3 sentences
    ]
    pd.DataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in text_c4_rules(spark, d).collect()}
    assert out[1]["n_kept_lines"] == 2 and out[1]["keep"] == 1
    assert out[2]["n_kept_lines"] == 1          # \x0B IS a separator
    assert out[2]["keep"] == 0                  # but only 1 sentence
    assert out[3]["n_kept_lines"] == 0          # NEL is not [ \t\r]
    assert out[4]["n_kept_lines"] >= 2 and out[4]["keep"] == 1
    assert out[5]["keep"] == 0 and out[5]["has_curly_brace"] == 1
    assert out[6]["keep"] == 0 and out[6]["has_lorem_ipsum"] == 1
    assert out[7]["n_sentences"] == 0 and out[7]["keep"] == 0
    assert out[8]["keep"] == 0
    compare(text_c4_rules(spark, d), ORACLES["text_c4_rules"], d,
            name="text_c4_rules@hostile")


def test_embedding_health_hostile_vectors(spark, tmp_path):
    """Hand-checked embedding DQ on a hostile fixture: NULL vectors,
    wrong dimensions, NaN / ±Inf components, the zero vector, and
    known norms — classified in priority order (null → bad_dim →
    non_finite → norm), with the fixed-point mean over only the
    healthy vectors; oracle compare pins the cross-engine branches."""
    import numpy as np
    import pandas as pd

    from university_data_lakehouse_spark.operators.quality import (
        ORACLES,
        dq_embedding_health,
    )
    from tests.oracle_utils import compare

    def vec(fill):
        return np.full(64, fill, dtype=np.float32).tolist()

    rows = [
        (1, vec(0.125), 0),            # norm = 1.0 (8*0.125)
        (2, vec(0.25), 0),             # norm = 2.0
        (3, vec(0.0), 0),              # zero vector
        (4, None, 0),                  # NULL embedding
        (5, [1.0, 2.0, 3.0], 0),       # wrong dimension
        # the pandas/arrow writer sanitizes NaN inside list columns
        # to NULL — the operator counts BOTH spellings as non-finite
        (6, vec(1.0)[:63] + [float("nan")], 0),   # NaN -> NULL component
        (7, vec(1.0)[:63] + [float("inf")], 0),   # +Inf component
        (8, vec(1.0)[:63] + [float("-inf")], 0),  # -Inf component
        (9, vec(0.375), 1),            # other label, norm = 3.0
    ]
    d = str(tmp_path / "emb")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).astype(
        {"vec_id": "int64", "label": "int32"}
    ).to_parquet(os.path.join(d, "embeddings.parquet"))
    out = {r["label"]: r for r in dq_embedding_health(spark, d).collect()}
    l0 = out[0]
    assert l0["n_vectors"] == 8 and l0["n_null"] == 1
    assert l0["n_bad_dim"] == 1 and l0["n_non_finite"] == 3
    assert l0["n_zero_norm"] == 1
    assert l0["min_norm"] == 0.0 and l0["max_norm"] == 2.0
    assert l0["mean_norm"] == 1.0        # (1.0 + 2.0 + 0.0) / 3
    assert out[1]["mean_norm"] == 3.0
    compare(dq_embedding_health(spark, d),
            ORACLES["dq_embedding_health"], d,
            name="dq_embedding_health@hostile")


def test_benford_hand_values(spark, tmp_path):
    """Hand-checked Benford MAD: a corpus whose first-digit counts
    are round(expected·10000) lands in the 'close' conformity band
    (deviations ≤ 5e-5); one value per digit (uniform 1/9) is
    nonconforming with MAD = mean |1/9 − expected|; zero rows after
    the positive filter still yields the 9-digit frame. Oracle
    compare on the conforming fixture."""
    import pandas as pd

    from university_data_lakehouse_spark.operators.quality import (
        BENFORD_EXPECTED,
        ORACLES,
        dq_benford,
    )
    from tests.oracle_utils import compare

    def write(d, values):
        os.makedirs(d, exist_ok=True)
        pd.DataFrame({
            "o_orderkey": range(len(values)),
            "o_custkey": [1] * len(values),
            "o_totalprice": values,
            "o_orderpriority": ["1-URGENT"] * len(values),
        }).to_parquet(os.path.join(d, "orders.parquet"))

    conforming = []
    for dd in range(1, 10):
        conforming += [float(dd * 100)] * round(BENFORD_EXPECTED[dd] * 10000)
    d1 = str(tmp_path / "conf")
    write(d1, conforming)
    out = {r["digit"]: r for r in dq_benford(spark, d1).collect()}
    assert len(out) == 9 and out[1]["conformity"] == "close"
    assert out[1]["n_values"] == round(BENFORD_EXPECTED[1] * 10000)
    compare(dq_benford(spark, d1), ORACLES["dq_benford"], d1,
            name="dq_benford@conforming")

    d2 = str(tmp_path / "unif")
    write(d2, [float(dd) for dd in range(1, 10)])
    out2 = {r["digit"]: r for r in dq_benford(spark, d2).collect()}
    exp_mad = sum(abs(1 / 9 - BENFORD_EXPECTED[dd])
                  for dd in range(1, 10)) / 9
    assert abs(out2[1]["mad"] - exp_mad) < 1e-5
    assert out2[1]["conformity"] == "nonconforming"

    d3 = str(tmp_path / "empty")
    write(d3, [-5.0, 0.0])              # nothing survives the filter
    out3 = dq_benford(spark, d3).collect()
    assert len(out3) == 9
    assert all(r["n_values"] == 0 for r in out3)


def test_fineweb_rules_hand_values(spark, tmp_path):
    """Hand-checked FineWeb gate arithmetic: a clean page passes; a
    boilerplate page trips the duplicated-line-chars rule (sorted
    adjacency must count EVERY occurrence of a repeated line, incl.
    3+ repeats); a listicle of short lines trips the short-line rule;
    a page of unterminated lines trips the punctuation floor; empty
    page drops with keep=0 (NULL dup ratio coalesced). Oracle compare
    pins the cross-engine arithmetic on the same fixture."""
    import pandas as pd

    from university_data_lakehouse_spark.operators.text import (
        ORACLES,
        text_fineweb_rules,
    )
    from tests.oracle_utils import compare

    clean = "\n".join(
        f"This is a long enough sentence number {i} to pass checks."
        for i in range(10))
    boiler = "\n".join(
        ["Subscribe to our newsletter now!"] * 3
        + [f"Some unique editorial sentence number {i} right here."
           for i in range(3)])
    shorts = "\n".join(["ok."] * 8 + ["A single longer closing line here."])
    nopunct = "\n".join(
        f"line {i} trails off without any terminal punctuation at all"
        for i in range(10))
    rows = [(1, clean), (2, boiler), (3, shorts), (4, nopunct), (5, "")]
    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in text_fineweb_rules(spark, d).collect()}
    assert out[1]["keep"] == 1 and out[1]["dup_line_chars"] == 0
    # all 3 occurrences of the 32-char line count: 96 dup chars
    assert out[2]["dup_line_chars"] == 96
    assert out[2]["dup_char_ratio"] > 0.1 and out[2]["keep"] == 0
    assert out[3]["short_line_ratio"] == 8 / 9 and out[3]["keep"] == 0
    assert out[4]["punct_line_ratio"] == 0.0 and out[4]["keep"] == 0
    assert out[5]["keep"] == 0 and out[5]["dup_char_ratio"] is None
    compare(text_fineweb_rules(spark, d), ORACLES["text_fineweb_rules"],
            d, name="text_fineweb_rules@hand")


def test_c4_spans_planted_duplicates(spark, tmp_path):
    """Cross-doc and within-doc 3-sentence span dups, short docs,
    case normalization — hand-checked, plus the bit-exact oracle
    compare on the same hostile corpus."""
    import pandas as pd

    from university_data_lakehouse_spark.operators.dedup import (
        ORACLES,
        dedup_c4_spans,
    )
    from tests.oracle_utils import compare

    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    shared = "Alpha beta gamma. Delta epsilon zeta! Eta theta iota?"
    rows = [
        (1, "Unique opener sentence. " + shared + " Unique closer one."),
        (2, "Different opener here! " + shared),     # cross-doc dup
        (3, "Rep one. Rep two. Rep three. " * 2),    # within-doc dup
        (4, "Too short. Only two!"),                 # < 3 sentences
        (5, ""),
        (6, "ALPHA beta GAMMA. delta EPSILON zeta! eta theta IOTA?"
            " And a different tail."),               # case-insensitive dup
    ]
    pd.DataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(os.path.join(d, "documents.parquet"))
    spark.catalog.clearCache()
    out = {r["doc_id"]: r for r in dedup_c4_spans(spark, d).collect()}
    assert out[1]["n_spans"] == 3 and out[1]["n_dup_spans"] == 0
    # doc 2's second span == doc 1's middle span (earlier occurrence)
    assert out[2]["n_spans"] == 2 and out[2]["n_dup_spans"] == 1
    assert out[2]["keep"] == 0
    # "Rep one..Rep three." x2 -> 6 sentences, 4 spans, span[3]==span[0]
    assert out[3]["n_spans"] == 4 and out[3]["n_dup_spans"] == 1
    assert out[4]["n_spans"] == 0 and out[4]["keep"] == 1
    assert out[4]["dup_span_ratio"] is None
    # lowercased span matches doc 1's shared span despite case
    assert out[6]["n_dup_spans"] == 1
    compare(dedup_c4_spans(spark, d), ORACLES["dedup_c4_spans"], d,
            name="dedup_c4_spans@hostile")
    spark.catalog.clearCache()


def test_psi_drift_planted_shift(spark, tmp_path):
    """A hand-planted distribution shift: reference half is all
    'view', current half is all 'click' — PSI must blow past the 0.2
    alert; a perfectly stable stream must sit near 0. Values checked
    against a NumPy-free hand computation of the smoothed PSI."""
    import math

    from university_data_lakehouse_spark.operators.quality import (
        ORACLES,
        PSI_SMOOTH,
        dq_psi_drift,
    )
    from tests.oracle_utils import compare

    def mk(rows_spec, name):
        import pandas as pd

        rows, eid = [], 0
        for hour, etype, n in rows_spec:
            for _ in range(n):
                rows.append((eid, _t(hour), 1, etype, 1.0, "{}"))
                eid += 1
        d = str(tmp_path / name)
        os.makedirs(d, exist_ok=True)
        # single-file parquet (pandas, not Spark's directory layout)
        # so the DuckDB side of compare() can read the same path
        pd.DataFrame(rows, columns=[
            "event_id", "ts", "user_id", "event_type", "value", "props",
        ]).to_parquet(os.path.join(d, "events.parquet"))
        return d

    # shift: hours 0-9 all 'view' (100), hours 10-19 all 'click' (100)
    d = mk([(h, "view", 10) for h in range(10)]
           + [(h, "click", 10) for h in range(10, 20)], "shift")
    out = {r["event_type"]: r for r in dq_psi_drift(spark, d).collect()}
    # midpoint = (h0 + h19)/2 -> ref = hours 0-9 exactly
    assert out["view"]["n_ref"] == 100 and out["view"]["n_cur"] == 0
    assert out["click"]["n_ref"] == 0 and out["click"]["n_cur"] == 100
    p_hi = (100 + PSI_SMOOTH) / 102.0
    p_lo = (0 + PSI_SMOOTH) / 102.0
    contrib = round((p_hi - p_lo) * math.log(p_hi / p_lo), 6)
    assert out["view"]["psi_contribution"] == contrib
    assert out["view"]["drift_flag"] == 1
    assert out["view"]["psi_total"] >= 2 * contrib - 1e-6
    compare(dq_psi_drift(spark, d), ORACLES["dq_psi_drift"], d,
            name="dq_psi_drift@shift")

    # stable: identical mix in both halves -> contributions 0, no flag
    d2 = mk([(h, t, 5) for h in range(20)
             for t in ("view", "click")], "stable")
    out2 = dq_psi_drift(spark, d2).collect()
    assert all(r["drift_flag"] == 0 for r in out2)
    assert all(abs(r["psi_contribution"]) < 1e-4 for r in out2)


def test_psi_drift_pre_epoch_floor_bucketing(spark, tmp_path):
    """Pre-1970 timestamps exercise negative epoch-micros: the bucket
    index must be a FLOOR division in both engines (r11 ADVICE).  The
    'view' events sit at half past hours -10..-1 relative to the epoch
    — under floor division 1969-12-31 23:30 is bucket -1, under a
    truncating division it would collapse into bucket 0 and leak into
    the current half.  The count assertions distinguish the two; the
    compare() call pins cross-engine parity on negative epochs."""
    import pandas as pd

    from university_data_lakehouse_spark.operators.quality import (
        ORACLES,
        dq_psi_drift,
    )
    from tests.oracle_utils import compare

    epoch = dt.datetime(1970, 1, 1)
    rows, eid = [], 0
    for h in range(-10, 10):
        etype = "view" if h < 0 else "click"
        for _ in range(10):
            ts = epoch + dt.timedelta(hours=h, minutes=30)
            rows.append((eid, ts, 1, etype, 1.0, "{}"))
            eid += 1
    d = str(tmp_path / "preepoch")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]).to_parquet(os.path.join(d, "events.parquet"))

    out = {r["event_type"]: r for r in dq_psi_drift(spark, d).collect()}
    # floor buckets: view -10..-1, click 0..9; midpoint split at b>=0.
    assert out["view"]["n_ref"] == 100 and out["view"]["n_cur"] == 0
    assert out["click"]["n_ref"] == 0 and out["click"]["n_cur"] == 100
    assert out["view"]["drift_flag"] == 1
    compare(dq_psi_drift(spark, d), ORACLES["dq_psi_drift"], d,
            name="dq_psi_drift@pre_epoch")


def test_dedup_lsh_dirty_corpus_filtered_and_oracle_parity(spark, tmp_path):
    """r11 ADVICE: the dedup embedding-LSH family (narrow, wide, auto)
    and the semantic-contamination pipeline filter invalid vectors at
    entry with _valid_vec AND carry _SQL_VALID_VEC in their oracles —
    the same contract the similarity pipelines got in r10.  Planted
    exact duplicates guarantee non-empty pair output; the invalid rows
    (NULL / ragged / NaN-component) must never surface as pair ids,
    and parity must be bit-exact, not incidental."""
    import numpy as np
    import pandas as pd

    from tests.oracle_utils import compare
    from university_data_lakehouse_spark.operators.dedup import (
        ORACLES as DEDUP_ORACLES,
        _emb_lsh_wide_oracle,
        dedup_embedding_lsh,
        dedup_embedding_lsh_auto,
        dedup_embedding_lsh_wide,
    )
    from university_data_lakehouse_spark.operators.pipeline import (
        ORACLES as PIPE_ORACLES,
        text_contamination_semantic,
    )

    rng = np.random.default_rng(17)

    def unit():
        x = rng.standard_normal(64)
        return (x / np.linalg.norm(x)).astype(np.float32).tolist()

    rows = [(i, unit(), 0) for i in range(120)]
    # planted exact duplicates -> guaranteed candidate pairs
    rows[11] = (11, rows[10][1], 0)
    rows[21] = (21, rows[20][1], 0)
    # a benchmark/train duplicate pair for the contamination check
    rows[30] = (30, rows[33][1], 0)   # 30 is bench (%10), 33 is train
    rows[5] = (5, None, 0)            # NULL vector
    rows[6] = (6, [1.0, 2.0], 0)      # ragged
    bad_nan = unit()
    bad_nan[3] = float("nan")
    rows[7] = (7, bad_nan, 0)         # NaN -> NULL component on write
    d = str(tmp_path / "emb")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).astype(
        {"vec_id": "int64", "label": "int32"}
    ).to_parquet(os.path.join(d, "embeddings.parquet"))

    bad = {5, 6, 7}
    for key, fn, sql in [
        ("dedup_embedding_lsh", dedup_embedding_lsh,
         DEDUP_ORACLES["dedup_embedding_lsh"]),
        ("dedup_embedding_lsh_wide", dedup_embedding_lsh_wide,
         _emb_lsh_wide_oracle()),
        ("dedup_embedding_lsh_auto", dedup_embedding_lsh_auto,
         DEDUP_ORACLES["dedup_embedding_lsh_auto"]),
        ("text_contamination_semantic", text_contamination_semantic,
         PIPE_ORACLES["text_contamination_semantic"]),
    ]:
        pdf = fn(spark, d).toPandas()
        for col in ("id_a", "id_b", "doc_id"):
            if col in pdf.columns:
                assert not (set(pdf[col]) & bad), (key, col)
        if key.startswith("dedup"):
            pairs = set(zip(pdf["id_a"], pdf["id_b"]))
            assert {(10, 11), (20, 21)} <= pairs, key
        else:
            hit = pdf[pdf["doc_id"] == 33]
            assert int(hit["n_semantic_hits"].iloc[0]) >= 1
        compare(fn(spark, d), sql, d, name=f"{key}@dirty")
    spark.catalog.clearCache()


def test_basket_affinity_matches_pairwise_reference(spark, tmp_path):
    """r12 basket-form rewrite pinned against an INDEPENDENT
    pair-generation reference: pair/part/order counts and support/
    lift recomputed in Python from itertools.combinations over the
    raw rows — duplicate (order, part) lines collapse, a basket over
    the cap vanishes from every statistic (numerators AND
    denominators), and the top-K tie-break is (n_both desc, pa, pb)."""
    import itertools
    import math

    from university_data_lakehouse_spark.operators.olap import (
        BASKET_MAX_LINES,
        olap_basket_affinity,
    )

    rows = []
    lid = 0
    # order 1: parts 1,2,3 (+ a duplicate line for part 2)
    for pk in (1, 2, 3, 2):
        lid += 1
        rows.append((1, pk, lid))
    # order 2: parts 2,3
    for pk in (2, 3):
        lid += 1
        rows.append((2, pk, lid))
    # order 3: parts 1,2
    for pk in (1, 2):
        lid += 1
        rows.append((3, pk, lid))
    # order 4: an over-cap basket — must vanish entirely
    for pk in range(1000, 1000 + BASKET_MAX_LINES + 1):
        lid += 1
        rows.append((4, pk, lid))
    d = str(tmp_path / "mini")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "lineitem.parquet"))

    baskets = {1: {1, 2, 3}, 2: {2, 3}, 3: {1, 2}}   # order 4 capped out
    n_orders = len(baskets)
    n_part = {}
    n_both = {}
    for parts in baskets.values():
        for p in parts:
            n_part[p] = n_part.get(p, 0) + 1
        for pa, pb in itertools.combinations(sorted(parts), 2):
            n_both[(pa, pb)] = n_both.get((pa, pb), 0) + 1
    expect = {}
    ranked = sorted(n_both, key=lambda k: (-n_both[k], k))
    for rank, (pa, pb) in enumerate(ranked, start=1):
        expect[(pa, pb)] = (
            rank, n_both[(pa, pb)], n_part[pa], n_part[pb],
            n_both[(pa, pb)] / n_orders,
            n_both[(pa, pb)] * n_orders / (n_part[pa] * n_part[pb]),
        )

    got = {(r["pa"], r["pb"]):
           (r["pair_rank"], r["n_both"], r["n_a"], r["n_b"],
            r["support"], r["lift"])
           for r in olap_basket_affinity(spark, d).collect()}
    assert set(got) == set(expect)
    for k, (rank, nb, na, nbp, sup, lift) in expect.items():
        g = got[k]
        assert g[:4] == (rank, nb, na, nbp), k
        assert math.isclose(g[4], sup, rel_tol=0, abs_tol=0), k
        assert math.isclose(g[5], lift, rel_tol=0, abs_tol=0), k
