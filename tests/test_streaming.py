"""Streaming tests (SURVEY §5.4): availableNow incremental pickup
(sensor-cursor semantics), watermark late-data handling, stateful
sessionization — memory sink + processAllAvailable."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from university_data_lakehouse_spark.streaming.ingestion import (
    freshness_check,
    ingest_available_now,
    landing_stream,
)
from university_data_lakehouse_spark.streaming.stateful import sessionize_stream
from university_data_lakehouse_spark.streaming.windowed import (
    streaming_dedup,
    tumbling_counts,
)

EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])


def _ts(minute: int, hour: int = 10) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_ingestion_cursor_semantics(spark, tmp_path):
    """availableNow + checkpoint = the reference's S3 sensor cursor:
    second tick picks up ONLY files landed after the first tick."""
    landing = str(tmp_path / "landing")
    bronze = str(tmp_path / "bronze")
    chk = str(tmp_path / "chk")

    _write_batch(spark, landing, [(1, _ts(0), 1, "click", 1.0)])
    stream = landing_stream(spark, landing, EVENT_SCHEMA)
    q = ingest_available_now(stream, bronze, chk)
    q.awaitTermination(120)
    assert spark.read.parquet(bronze).count() == 1

    # second landing file → only the delta is ingested on the next tick
    _write_batch(spark, landing, [(2, _ts(1), 1, "view", 2.0), (3, _ts(2), 2, "click", 3.0)])
    stream = landing_stream(spark, landing, EVENT_SCHEMA)
    q = ingest_available_now(stream, bronze, chk)
    q.awaitTermination(120)
    out = spark.read.parquet(bronze)
    assert out.count() == 3
    assert out.select("_source_file").distinct().count() >= 2

    fresh = freshness_check(spark, bronze, "ts", max_age_hours=1.0,
                            now=_ts(30))
    assert fresh["passed"] and fresh["age_hours"] <= 1.0


def test_watermark_drops_late_rows(spark, tmp_path):
    """Rows arriving behind the watermark are dropped from finalized
    windows (late-data semantics)."""
    src = str(tmp_path / "wm_src")
    chk = str(tmp_path / "wm_chk")

    # batch 1: on-time rows that advance the watermark past 08:00+2h
    _write_batch(spark, src, [
        (1, _ts(0, 8), 1, "click", 1.0),
        (2, _ts(30, 8), 1, "click", 1.0),
        (3, _ts(0, 12), 2, "view", 5.0),   # pushes watermark forward
    ])
    stream = landing_stream(spark, src, EVENT_SCHEMA).drop(
        "_ingested_at", "_source_file"
    )
    agg = tumbling_counts(stream, "1 hour", "2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a VERY late row for the 08:00 window (behind watermark)
        _write_batch(spark, src, [(4, _ts(45, 8), 9, "click", 100.0)])
        q.processAllAvailable()
        # one more on-time row so a further micro-batch finalizes state
        _write_batch(spark, src, [(5, _ts(0, 13), 2, "view", 7.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM wm_out").collect()
    # finalized 08:00 window must NOT include the late row's value
    w8 = [r for r in rows if r.window_start.hour == 8]
    assert w8, rows
    assert all(r.total_value <= 2.0 for r in w8), w8


def test_streaming_dedup_drops_replays(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replays of an already-seen
    event_id within the watermark horizon are discarded; distinct
    ids all pass through."""
    src = str(tmp_path / "dd_src")
    chk = str(tmp_path / "dd_chk")
    _write_batch(spark, src, [
        (1, _ts(0), 1, "click", 1.0),
        (2, _ts(1), 1, "view", 2.0),
    ])
    stream = landing_stream(spark, src, EVENT_SCHEMA).drop(
        "_ingested_at", "_source_file"
    )
    deduped = streaming_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        # replay event 1 (same id, later arrival) + one new event
        _write_batch(spark, src, [
            (1, _ts(10), 1, "click", 1.0),
            (3, _ts(11), 2, "view", 3.0),
        ])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT event_id, count(*) AS n FROM dd_out "
                     "GROUP BY event_id").collect()
    got = {r.event_id: r.n for r in rows}
    assert got == {1: 1, 2: 1, 3: 1}, got


def test_stateful_sessionize(spark, tmp_path):
    """applyInPandasWithState session accumulator: a >30min gap within
    one user's events closes the first session and emits it."""
    src = str(tmp_path / "sess_src")
    chk = str(tmp_path / "sess_chk")
    _write_batch(spark, src, [
        (1, _ts(0), 7, "click", 1.0),
        (2, _ts(5), 7, "view", 2.0),
        (3, _ts(50), 7, "click", 4.0),   # 45min gap → closes session 1
        (4, _ts(0, 9), 8, "view", 9.0),  # other user, single session
    ])
    stream = landing_stream(spark, src, EVENT_SCHEMA).select(
        "user_id", "ts", "value"
    )
    sessions = sessionize_stream(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # the closed session for user 7 (2 events, value 3.0) must be emitted
    assert (7, 2, 3.0) in out, out


def test_corpus_ops_compose_on_streams(spark, sf_dir, tmp_path):
    """Batch/streaming unification: the corpus-construction narrow
    maps (sample gate, PII scrub) are stateless transforms, so the
    SAME functions run unchanged on a readStream of the documents
    table and produce exactly the batch results."""
    import os as _os

    from university_data_lakehouse_spark.operators.pipeline import (
        chunk_docs,
        pii_scrub,
        sample_gate,
    )
    from university_data_lakehouse_spark.sources.loader import load_table

    batch_docs = load_table(spark, sf_dir, "documents")
    # file-source streams read directories; testdata ships one file
    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    _os.symlink(_os.path.join(sf_dir, "documents.parquet"),
                stream_dir / "part-0.parquet")
    stream_docs = (
        spark.readStream.schema(batch_docs.schema)
        .parquet(str(stream_dir))
    )

    out = {}
    for name, fn in (("samp", sample_gate), ("pii", pii_scrub),
                     ("chunk", chunk_docs)):
        q = (
            fn(stream_docs).writeStream.format("memory")
            .queryName(f"corpus_{name}")
            .option("checkpointLocation", str(tmp_path / name))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out[name] = {
            tuple(r) for r in spark.sql(f"SELECT * FROM corpus_{name}").collect()
        }
    assert out["samp"] == {tuple(r) for r in sample_gate(batch_docs).collect()}
    assert out["pii"] == {tuple(r) for r in pii_scrub(batch_docs).collect()}
    assert out["chunk"] == {tuple(r) for r in chunk_docs(batch_docs).collect()}
    assert len(out["pii"]) > 0


def test_streaming_merge_sink_upserts(spark, tmp_path):
    """foreachBatch MERGE sink: tick 1 bootstraps the managed table,
    tick 2 (new landing file, same keys + a new key) UPSERTS through
    the checkpoint cursor — updates in place, no append-only
    duplication, previous version still time-travelable."""
    from university_data_lakehouse_spark.streaming.sink import (
        merge_into_table,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    landing = str(tmp_path / "landing")
    chk = str(tmp_path / "chk")
    catalog = TableCatalog(str(tmp_path / "warehouse"))
    table = catalog.table("silver/events_latest")

    def prepare(df):
        # collapse intra-batch replays to the latest row per key
        return (
            df.groupBy("event_id")
            .agg(F.max(F.struct("ts", "user_id", "event_type", "value"))
                 .alias("mx"))
            .select("event_id", "mx.ts", "mx.user_id", "mx.event_type",
                    "mx.value")
        )

    def tick():
        q = merge_into_table(
            spark.readStream.schema(EVENT_SCHEMA).parquet(landing),
            table, keys=["event_id"], checkpoint_dir=chk,
            prepare=prepare,
        )
        q.awaitTermination(120)

    _write_batch(spark, landing, [(1, _ts(0), 1, "click", 1.0),
                                  (2, _ts(1), 1, "view", 2.0)])
    tick()
    assert table.manifest()["operation"] == "bootstrap"
    v1 = table.latest_version()
    assert {(r.event_id, r.value) for r in table.read(spark).collect()} == {
        (1, 1.0), (2, 2.0)}

    # tick 2: event 2 replayed with a newer value + new event 3
    _write_batch(spark, landing, [(2, _ts(5), 1, "view", 9.0),
                                  (3, _ts(6), 2, "buy", 3.0)])
    tick()
    assert table.manifest()["operation"] == "merge"
    got = {(r.event_id, r.value) for r in table.read(spark).collect()}
    assert got == {(1, 1.0), (2, 9.0), (3, 3.0)}
    # the pre-merge snapshot is still readable (time travel)
    old = {(r.event_id, r.value) for r in table.read(spark, v1).collect()}
    assert old == {(1, 1.0), (2, 2.0)}

    # an empty tick (no new files) is a no-op
    v2 = table.latest_version()
    tick()
    assert table.latest_version() == v2


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream event-time interval join: a click attributes to a
    view by user within 30 minutes AFTER it; outside-window or
    cross-user pairs never join. Both sides are real streams (two
    file sources), so this exercises dual-sided state buffering."""
    from university_data_lakehouse_spark.streaming.windowed import (
        interval_join,
    )

    views = str(tmp_path / "views")
    clicks = str(tmp_path / "clicks")
    _write_batch(spark, views, [
        (1, _ts(0), 1, "view", 1.0),        # joined by click @ +10min
        (2, _ts(0), 2, "view", 1.0),        # click too late (+45min)
        (3, _ts(30), 1, "view", 1.0),       # joined by click @ +5min
    ])
    _write_batch(spark, clicks, [
        (101, _ts(10), 1, "click", 1.0),    # -> view 1
        (102, _ts(45), 2, "click", 1.0),    # 45min after view 2: dropped
        (103, _ts(35), 1, "click", 1.0),    # -> views 1 (35m? no: >30m) & 3
        (104, _ts(5), 3, "click", 1.0),     # no view for user 3
    ])
    out = interval_join(
        spark.readStream.schema(EVENT_SCHEMA).parquet(views),
        spark.readStream.schema(EVENT_SCHEMA).parquet(clicks),
    )
    q = (
        out.writeStream.format("memory").queryName("ij")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.l_event_id, r.r_event_id)
           for r in spark.sql("SELECT * FROM ij").collect()}
    assert got == {(1, 101), (3, 103)}, got
    delays = {(r.l_event_id, r.r_event_id): r.delay_us
              for r in spark.sql("SELECT * FROM ij").collect()}
    assert delays[(1, 101)] == 10 * 60 * 1_000_000
    assert delays[(3, 103)] == 5 * 60 * 1_000_000


def test_native_session_windows_match_stateful(spark, tmp_path):
    """F.session_window sessions agree with the imperative
    applyInPandasWithState sessionizer on the same stream: same
    per-user session count and event totals."""
    from university_data_lakehouse_spark.streaming.windowed import (
        session_windows,
    )

    src = str(tmp_path / "events")
    _write_batch(spark, src, [
        (1, _ts(0), 1, "view", 1.0),
        (2, _ts(10), 1, "click", 2.0),      # same session (gap 30m)
        (3, _ts(55), 1, "view", 4.0),       # 45m silence: new session
        (4, _ts(5), 2, "view", 8.0),        # other user
    ])
    out = session_windows(
        spark.readStream.schema(EVENT_SCHEMA).parquet(src), gap="30 minutes")
    # complete mode: append would hold sessions until the watermark
    # passes their end, which a single availableNow batch never does
    q = (out.writeStream.format("memory").queryName("sw")
         .option("checkpointLocation", str(tmp_path / "chk"))
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sw").collect()
    got = {(r.user_id, r.n_events, r.total_value) for r in rows}
    assert got == {(1, 2, 3.0), (1, 1, 4.0), (2, 1, 8.0)}, got
    # session bounds: end = last event + gap
    s1 = min(r.session_start for r in rows if r.user_id == 1)
    assert s1 == _ts(0)


def test_table_change_feed_propagates_to_downstream_table(spark, tmp_path):
    """Managed table as an incremental source: poll/commit cursor
    ticks deliver bootstrap, append-only (file-level fast path), and
    rewrite (keyed diff) ranges; MERGEing each tick downstream keeps
    the mirror equal to the source, a crash between poll and commit
    only replays (idempotent merge), and deletes propagate."""
    from pyspark.sql import Row

    from university_data_lakehouse_spark.streaming.source import (
        TableChangeFeed,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    cat = TableCatalog(str(tmp_path / "wh"))
    src, dst = cat.table("src"), cat.table("dst")

    def mk(rows):
        return spark.createDataFrame([Row(id=i, val=v) for i, v in rows])

    def apply_tick(feed):
        df, target = feed.poll(spark)
        if df is None:
            return 0
        deletes = df.where("_change_type = 'delete'").drop(
            "_change_type", "_commit_version")
        upserts = df.where("_change_type <> 'delete'").drop(
            "_change_type", "_commit_version")
        if not dst.exists():
            dst.write(upserts, operation="bootstrap")
        else:
            if not upserts.isEmpty():
                dst.merge(upserts, keys=["id"])
            for r in deletes.collect():
                dst.delete_where(spark, {"id": (r.id, r.id)})
        feed.commit(target)
        return target

    feed = TableChangeFeed(src, str(tmp_path / "chk"), keys=["id"])
    src.write(mk([(1, "a"), (2, "b")]))                       # v1
    assert apply_tick(feed) == 1                              # bootstrap
    src.write(mk([(3, "c")]), mode="append")                  # v2 fast path
    src.write(mk([(4, "d")]), mode="append")                  # v3 fast path
    assert apply_tick(feed) == 3
    both = lambda t: {(r.id, r.val) for r in t.read(spark).collect()}
    assert both(dst) == both(src)

    src.merge(mk([(2, "B*"), (5, "e")]), keys=["id"])         # v4 rewrite
    src.delete_where(spark, {"id": (1, 1)})                   # v5 delete
    assert apply_tick(feed) == 5                              # keyed diff
    assert both(dst) == both(src) == {(2, "B*"), (3, "c"), (4, "d"),
                                      (5, "e")}

    # replay safety: a new feed over the same checkpoint resumes at 5
    feed2 = TableChangeFeed(src, str(tmp_path / "chk"), keys=["id"])
    df, cur = feed2.poll(spark)
    assert df is None and cur == 5


def test_streaming_sink_expectations_drop_to_quarantine(spark, tmp_path):
    """Streaming expectations (DLT parity in the sink): dropped rows
    land in the quarantine table tagged with the violated expectation
    instead of vanishing; only conforming rows reach the MERGE; a
    fail-action violation fails the batch and leaves the checkpoint
    replayable."""
    from university_data_lakehouse_spark.streaming.sink import (
        merge_into_table,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    landing = str(tmp_path / "landing")
    catalog = TableCatalog(str(tmp_path / "warehouse"))
    table = catalog.table("silver/clean_events")
    quarantine = catalog.table("meta/quarantine")

    def tick(chk, expectations):
        q = merge_into_table(
            spark.readStream.schema(EVENT_SCHEMA).parquet(landing),
            table, keys=["event_id"], checkpoint_dir=chk,
            expectations=expectations, quarantine=quarantine,
        )
        q.awaitTermination(120)

    _write_batch(spark, landing, [(1, _ts(0), 1, "click", 1.0),
                                  (2, _ts(1), 1, "view", -5.0),
                                  (3, _ts(2), 2, "view", 2.0)])
    tick(str(tmp_path / "chk1"),
         (("value_nonneg", "value >= 0", "drop"),))
    assert {r.event_id for r in table.read(spark).collect()} == {1, 3}
    qr = quarantine.read(spark).collect()
    assert [(r.event_id, r._violated) for r in qr] == [(2, "value_nonneg")]

    # a fail-action violation fails the query (checkpoint replayable)
    import pyspark.errors

    with pytest.raises(pyspark.errors.exceptions.captured.StreamingQueryException):
        tick(str(tmp_path / "chk2"),
             (("value_nonneg", "value >= 0", "fail"),))


def test_vacuumed_change_feed_fails_clearly_then_recovers(spark, tmp_path):
    """VERDICT r5 #8: a CDF cursor pointing below the vacuum horizon
    must raise a clear VersionExpiredError (Delta parity) — not a
    FileNotFoundError mid-stream — and the documented recovery
    (feed.reset() → snapshot bootstrap → incremental resume) must
    converge the mirror."""
    from pyspark.sql import Row

    from university_data_lakehouse_spark.streaming.source import (
        TableChangeFeed,
    )
    from university_data_lakehouse_spark.tables import TableCatalog
    from university_data_lakehouse_spark.tables.format import (
        VersionExpiredError,
    )

    cat = TableCatalog(str(tmp_path / "wh"))
    src = cat.table("src")

    def mk(rows):
        return spark.createDataFrame([Row(id=i, val=v) for i, v in rows])

    src.write(mk([(1, "a")]))                      # v1
    feed = TableChangeFeed(src, str(tmp_path / "chk"), keys=["id"])
    df, target = feed.poll(spark)
    assert df is not None
    feed.commit(target)                            # cursor = 1

    src.write(mk([(2, "b")]), mode="append")       # v2
    src.write(mk([(3, "c")]), mode="append")       # v3
    src.vacuum(keep_versions=1, min_age_seconds=0.0)  # log tail dropped

    with pytest.raises(VersionExpiredError, match="vacuumed away"):
        feed.poll(spark)
    # the cursor itself is untouched by the failed poll
    assert feed.cursor() == 1

    # documented recovery: reset -> full-snapshot bootstrap
    feed.reset()
    df, target = feed.poll(spark)
    assert target == 3
    rows = {(r.id, r.val) for r in df.collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}
    assert set(df.select("_change_type").distinct().toPandas()[
        "_change_type"]) == {"insert"}
    feed.commit(target)

    # incremental polls resume on the fast path after recovery
    src.write(mk([(4, "d")]), mode="append")       # v4
    df, target = feed.poll(spark)
    assert target == 4
    assert {(r.id, r.val) for r in df.collect()} == {(4, "d")}


def test_text_gates_compose_on_streams(spark, sf_dir, tmp_path):
    """r11 (VERDICT item 3a): the pretraining-gate trilogy — Gopher,
    C4, FineWeb — is stateless narrow maps, so the SAME DataFrame-
    level functions run unchanged on a readStream of the documents
    table and produce exactly the batch results (the sample_gate /
    pii_scrub unification discipline; zero new registry keys)."""
    import os as _os

    from university_data_lakehouse_spark.operators.text import (
        c4_rules,
        fineweb_rules,
        gopher_rules,
    )
    from university_data_lakehouse_spark.sources.loader import load_table

    batch_docs = load_table(spark, sf_dir, "documents")
    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    _os.symlink(_os.path.join(sf_dir, "documents.parquet"),
                stream_dir / "part-0.parquet")
    stream_docs = (
        spark.readStream.schema(batch_docs.schema)
        .parquet(str(stream_dir))
    )

    for name, fn in (("gopher", gopher_rules), ("c4", c4_rules),
                     ("fineweb", fineweb_rules)):
        q = (
            fn(stream_docs).writeStream.format("memory")
            .queryName(f"gate_{name}")
            .option("checkpointLocation", str(tmp_path / name))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {tuple(r) for r in
                    spark.sql(f"SELECT * FROM gate_{name}").collect()}
        batch = {tuple(r) for r in fn(batch_docs).collect()}
        assert streamed == batch, name
        assert len(streamed) > 0, name


def test_corpus_narrow_maps_compose_on_streams(spark, sf_dir, tmp_path):
    """r12 (VERDICT r11 item 5a): the corpus-construction narrow maps
    not yet stream-unified — deterministic split assignment and
    sliding-window chunking — run UNCHANGED on a readStream of the
    documents table and reproduce the batch results exactly. Both are
    stateless per-row maps (split: md5 hash gate; chunk: bounded
    explode), so streaming needs no watermark, no state store, and no
    new registry key."""
    import os as _os

    from university_data_lakehouse_spark.operators.pipeline import (
        chunk_docs,
        split_assign,
    )
    from university_data_lakehouse_spark.sources.loader import load_table

    batch_docs = load_table(spark, sf_dir, "documents")
    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    _os.symlink(_os.path.join(sf_dir, "documents.parquet"),
                stream_dir / "part-0.parquet")
    stream_docs = (
        spark.readStream.schema(batch_docs.schema)
        .parquet(str(stream_dir))
    )

    for name, fn in (("split", split_assign), ("chunk", chunk_docs)):
        q = (
            fn(stream_docs).writeStream.format("memory")
            .queryName(f"corpus_{name}")
            .option("checkpointLocation", str(tmp_path / name))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {tuple(r) for r in
                    spark.sql(f"SELECT * FROM corpus_{name}").collect()}
        batch = {tuple(r) for r in fn(batch_docs).collect()}
        assert streamed == batch, name
        assert len(streamed) > 0, name


def test_simhash_tagger_matches_python_reference(spark, sf_dir):
    """Independent bit pin for the 64-bit signature contract. Until
    r15 this compared the streaming fold against the batch twin; the
    twin is retired (the batch stage now PROJECTS simhash_tag, so a
    twin compare would be a tautology) and the redundancy it provided
    is replaced by a pure-Python hashlib.md5 reference: every bit of
    every signature on a 50-doc sample must equal the definitional
    majority vote — position i votes +1 iff md5 hex char i has its
    high bit set, family 2 salts the token with SIMHASH_WIDE_SALT."""
    import hashlib
    import re

    from university_data_lakehouse_spark.operators.dedup import (
        SIMHASH_WIDE_SALT,
        _simhash_signatures_wide,
    )
    from university_data_lakehouse_spark.sources.loader import load_table
    from university_data_lakehouse_spark.streaming.dedupe import simhash_tag

    docs = load_table(spark, sf_dir, "documents")
    sample = docs.orderBy("doc_id").limit(50)
    tagged = {r.doc_id: r.simhash
              for r in simhash_tag(sample)
              .select("doc_id", "simhash").collect()}
    texts = {r.doc_id: r.text
             for r in sample.select("doc_id", "text").collect()}

    def ref_sig(text: str) -> str | None:
        toks = list(dict.fromkeys(re.findall(r"[a-z0-9]+", text.lower())))
        if not toks:
            return None
        bits = []
        for salt in ("", SIMHASH_WIDE_SALT):
            hexes = [hashlib.md5((t + salt).encode()).hexdigest()
                     for t in toks]
            for i in range(32):
                vote = sum(1 if h[i] >= "8" else -1 for h in hexes)
                bits.append("1" if vote > 0 else "0")
        return "".join(bits)

    expected = {d: s for d, s in
                ((d, ref_sig(t)) for d, t in texts.items())
                if s is not None}
    assert tagged == expected and len(tagged) > 0
    # the two int halves reassemble the binary string
    row = simhash_tag(docs).first()
    assert f"{row.sig_hi:032b}{row.sig_lo:032b}" == row.simhash
    # and the batch stage is exactly the tagger's projection (the
    # unification holds on real data, not just by code reading)
    batch = {(r.doc_id, r.simhash)
             for r in _simhash_signatures_wide(spark, sf_dir).collect()}
    full = {(r.doc_id, r.simhash)
            for r in simhash_tag(load_table(spark, sf_dir, "documents"))
            .select("doc_id", "simhash").collect()}
    assert batch == full


def test_streaming_near_dup_flagging_matches_batch(spark, sf_dir,
                                                   tmp_path):
    """Dedup-on-ingest end-to-end: documents stream in, each is
    signature-tagged and band-joined (stream-static) against the
    historical corpus band table, and the flagged (doc_id, dup_of,
    hamming) rows equal the same flagger run in batch mode — each
    pair exactly once (the first-match emission needs no streaming
    state)."""
    import os as _os

    from university_data_lakehouse_spark.sources.loader import load_table
    from university_data_lakehouse_spark.streaming.dedupe import (
        corpus_band_table,
        flag_near_dups,
    )

    batch_docs = load_table(spark, sf_dir, "documents")
    corpus = corpus_band_table(batch_docs)

    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    _os.symlink(_os.path.join(sf_dir, "documents.parquet"),
                stream_dir / "part-0.parquet")
    stream_docs = (
        spark.readStream.schema(batch_docs.schema)
        .parquet(str(stream_dir))
    )

    q = (
        flag_near_dups(stream_docs, corpus)
        .writeStream.format("memory").queryName("ingest_flags")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {tuple(r) for r in
                spark.sql("SELECT * FROM ingest_flags").collect()}
    batch = {tuple(r) for r in
             flag_near_dups(batch_docs, corpus).collect()}
    assert streamed == batch and len(streamed) > 0
    # exactly-once: no (doc_id, dup_of) appears twice
    pairs = [(a, b) for a, b, _ in streamed]
    assert len(pairs) == len(set(pairs))
    # directionality: self-pairs excluded, both directions present
    # (the flagger is ingest-vs-corpus, not an ordered pair table)
    assert all(a != b for a, b in pairs)


def test_materialized_band_table_picks_up_corpus_roll(spark, tmp_path):
    """The SCALE path for dedup-on-ingest (VERDICT r13 item 2): the
    corpus band table is materialized through the managed-table layer
    once per corpus roll, and the running ingest query picks the roll
    up mid-query via ``flag_near_dups_foreach_batch`` — per-batch cost
    is a manifest read + thin parquet scan + the band join, never the
    corpus-wide signature fold.

    Construction makes pickup unambiguous: stream doc s2's ONLY
    near-dup (b1) enters the corpus in the roll, so s2 flags iff the
    SAME running query re-resolved the table after the roll."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from university_data_lakehouse_spark.streaming.dedupe import (
        flag_near_dups,
        flag_near_dups_foreach_batch,
        materialize_corpus_bands,
        read_corpus_bands,
    )
    from university_data_lakehouse_spark.tables.format import ManagedTable

    text_a = "alpha bravo charlie delta echo foxtrot golf hotel"
    text_b = "quark lepton boson hadron gluon photon neutrino meson"
    table_path = str(tmp_path / "corpus_bands")

    corpus_a = spark.createDataFrame([("a1", text_a)],
                                     "doc_id string, text string")
    v1 = materialize_corpus_bands(corpus_a, table_path)
    assert v1 == 1 and ManagedTable(table_path).latest_version() == 1

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    pq.write_table(pa.table({"doc_id": ["s1"], "text": [text_a]}),
                   stream_dir / "f1.parquet")

    batches: list[tuple[int, set, str, list]] = []

    def sink(flags_df, batch_id):
        plan = flags_df._jdf.queryExecution().optimizedPlan().toString()
        files = list(flags_df.inputFiles())
        batches.append((batch_id,
                        {tuple(r) for r in flags_df.collect()}, plan, files))

    q = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1).parquet(str(stream_dir))
        .writeStream.foreachBatch(
            flag_near_dups_foreach_batch(table_path, sink))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 1: s1 is an exact-token-set dup of corpus doc a1
        assert set().union(*(b[1] for b in batches)) == {("s1", "a1", 0)}

        # corpus ROLLS: b1 (s2's only near-dup) joins the corpus,
        # written through the SAME managed table while the query runs
        corpus_ab = spark.createDataFrame(
            [("a1", text_a), ("b1", text_b)], "doc_id string, text string")
        v2 = materialize_corpus_bands(corpus_ab, table_path)
        assert v2 == 2

        pq.write_table(pa.table({"doc_id": ["s2"], "text": [text_b]}),
                       stream_dir / "f2.parquet")
        q.processAllAvailable()
    finally:
        q.stop()

    flagged = set().union(*(b[1] for b in batches))
    # s2 flags against b1 ONLY if the running query picked up v2
    assert flagged == {("s1", "a1", 0), ("s2", "b1", 0)}
    # stream == batch at the rolled corpus, materialized-read side
    batch_flags = {tuple(r) for r in flag_near_dups(
        spark.createDataFrame([("s2", text_b)], "doc_id string, text string"),
        read_corpus_bands(spark, table_path)).collect()}
    assert batch_flags == {("s2", "b1", 0)}
    # per-batch plan: bands come from the table's parquet files — the
    # corpus-scale signature fold (md5 over corpus text) never appears
    # on the static side of the per-batch plan
    for _bid, _flags, plan, files in batches:
        assert any(table_path in f for f in files)  # band parquet feeds it
        assert plan.count("md5") <= 2      # incoming-side tag only (2 hash
        #                                    families), zero corpus folds


def test_near_dup_gated_ingest_quarantines_planted_dup(spark, tmp_path):
    """plans/corpus.near_dup_gated_ingest closes the loop from
    ingest-time flags to the corpus build: a planted near-dup streams
    in, lands in the quarantine table (tagged with the violated
    expectation and its closest corpus match), and NEVER reaches the
    bronze documents table the incremental build consumes; the novel
    doc in the same batch publishes normally."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from university_data_lakehouse_spark.plans.corpus import (
        near_dup_gated_ingest,
    )
    from university_data_lakehouse_spark.streaming.dedupe import (
        materialize_corpus_bands,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    text_a = "alpha bravo charlie delta echo foxtrot golf hotel"
    text_new = "quark lepton boson hadron gluon photon neutrino meson"
    band_path = str(tmp_path / "bands")
    materialize_corpus_bands(
        spark.createDataFrame([(1, text_a)], "doc_id long, text string"),
        band_path)

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([101, 102], type=pa.int64()),
                  "text": [text_a, text_new]}),
        stream_dir / "f1.parquet")

    catalog = TableCatalog(str(tmp_path / "lake"))
    q = near_dup_gated_ingest(
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(stream_dir)),
        catalog, str(tmp_path / "chk"), band_path)
    q.awaitTermination(120)

    published = catalog.table("bronze/documents_ingested").read(spark)
    assert [r.doc_id for r in published.collect()] == [102]
    # the pass-gate audit columns are null on published rows
    row = published.first()
    assert row._dup_of is None and row._dup_hamming is None

    quarantined = catalog.table("quarantine/near_dup_docs").read(spark)
    qrows = quarantined.collect()
    assert len(qrows) == 1
    assert (qrows[0].doc_id, qrows[0]._dup_of, qrows[0]._dup_hamming,
            qrows[0]._violated) == (101, 1, 0, "near_dup")


def test_roll_corpus_bands_is_incremental_and_equivalent(spark, tmp_path):
    """roll_corpus_bands folds ONLY the new documents and merges on
    (doc_id, band_idx): two incremental rolls produce exactly the
    band table a full materialization over the union would, a changed
    doc's re-roll replaces its 4 rows instead of duplicating them,
    and the flagger reads the rolled table identically."""
    from university_data_lakehouse_spark.streaming.dedupe import (
        corpus_band_table,
        flag_near_dups,
        read_corpus_bands,
        roll_corpus_bands,
    )

    text_a = "alpha bravo charlie delta echo foxtrot golf hotel"
    text_b = "quark lepton boson hadron gluon photon neutrino meson"
    text_b2 = "quark lepton boson hadron gluon photon neutrino kaon"
    path = str(tmp_path / "bands")
    schema = "doc_id long, text string"

    v1 = roll_corpus_bands(
        spark.createDataFrame([(1, text_a)], schema), path)
    v2 = roll_corpus_bands(
        spark.createDataFrame([(2, text_b)], schema), path)
    assert (v1, v2) == (1, 2)

    rolled = {tuple(r) for r in read_corpus_bands(spark, path).collect()}
    full = {tuple(r) for r in corpus_band_table(
        spark.createDataFrame([(1, text_a), (2, text_b)], schema)
    ).collect()}
    assert rolled == full and len(rolled) == 8   # 2 docs x 4 bands

    # a changed doc re-rolls in place: still 4 rows for doc 2, and
    # they carry the NEW signature
    roll_corpus_bands(spark.createDataFrame([(2, text_b2)], schema), path)
    rerolled = read_corpus_bands(spark, path)
    assert rerolled.count() == 8
    new_sig = {tuple(r) for r in corpus_band_table(
        spark.createDataFrame([(2, text_b2)], schema)).collect()}
    assert {tuple(r) for r in
            rerolled.where("doc_id = 2").collect()} == new_sig

    # the flagger over the rolled table flags a dup of the ROLLED text
    flags = {tuple(r) for r in flag_near_dups(
        spark.createDataFrame([(101, text_b2)], schema),
        read_corpus_bands(spark, path)).collect()}
    assert flags == {(101, 2, 0)}


def test_ingest_lifecycle_publish_roll_then_quarantine(spark, tmp_path):
    """The full dedup-on-ingest lifecycle, one running query: batch 1
    publishes a novel doc against an EMPTY (bootstrap) band table; an
    incremental roll_corpus_bands folds the published doc into the
    corpus; batch 2's near-dup of that doc is then quarantined — the
    loop where today's publishes become tomorrow's dedup corpus,
    picked up mid-query with no restart."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from university_data_lakehouse_spark.plans.corpus import (
        near_dup_gated_ingest,
    )
    from university_data_lakehouse_spark.streaming.dedupe import (
        materialize_corpus_bands,
        roll_corpus_bands,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    text = "alpha bravo charlie delta echo foxtrot golf hotel"
    band_path = str(tmp_path / "bands")
    schema = "doc_id long, text string"
    materialize_corpus_bands(spark.createDataFrame([], schema), band_path)

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                             "text": [text]}), stream_dir / "f1.parquet")

    catalog = TableCatalog(str(tmp_path / "lake"))
    # the gate runs availableNow per invocation; drive it tick-wise
    # (sensor semantics: same checkpoint, only new files per tick)
    q = near_dup_gated_ingest(
        spark.readStream.schema(schema).parquet(str(stream_dir)),
        catalog, str(tmp_path / "chk"), band_path)
    q.awaitTermination(120)
    docs_t = catalog.table("bronze/documents_ingested")
    assert [r.doc_id for r in docs_t.read(spark).collect()] == [1]

    # nightly roll: fold ONLY the newly published docs
    roll_corpus_bands(docs_t.read(spark).select("doc_id", "text"),
                      band_path)

    pq.write_table(pa.table({"doc_id": pa.array([2], type=pa.int64()),
                             "text": [text]}), stream_dir / "f2.parquet")
    q2 = near_dup_gated_ingest(
        spark.readStream.schema(schema).parquet(str(stream_dir)),
        catalog, str(tmp_path / "chk"), band_path)
    q2.awaitTermination(120)

    published = {r.doc_id
                 for r in catalog.table("bronze/documents_ingested")
                 .read(spark).collect()}
    assert published == {1}                      # the near-dup never landed
    qrows = catalog.table("quarantine/near_dup_docs").read(spark).collect()
    assert [(r.doc_id, r._dup_of, r._violated) for r in qrows] == [
        (2, 1, "near_dup")]


def test_forget_purges_band_table_and_reingest_publishes(spark, tmp_path):
    """RTBF x dedup-on-ingest (VERDICT r14 item 2): forgetting a doc
    must purge its simhash band rows too, or the signature ghost
    keeps flagging — a re-submitted forgotten document would be
    quarantined against its own ghost and never re-enter the corpus,
    contradicting forget_documents' "re-submitted content is treated
    as new" contract. Lifecycle: publish through the gate, roll the
    band table, forget (band_table_path + the ingest doc table via
    extra_tables), then re-ingest the SAME text under a new doc_id —
    it publishes, and no table still carries the forgotten id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from university_data_lakehouse_spark.plans.corpus import (
        forget_documents,
        near_dup_gated_ingest,
    )
    from university_data_lakehouse_spark.streaming.dedupe import (
        read_corpus_bands,
        roll_corpus_bands,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    text = "alpha bravo charlie delta echo foxtrot golf hotel"
    band_path = str(tmp_path / "bands")
    schema = "doc_id long, text string"

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                             "text": [text]}), stream_dir / "f1.parquet")
    catalog = TableCatalog(str(tmp_path / "lake"))
    near_dup_gated_ingest(
        spark.readStream.schema(schema).parquet(str(stream_dir)),
        catalog, str(tmp_path / "chk"), band_path,
    ).awaitTermination(120)
    docs_t = catalog.table("bronze/documents_ingested")
    assert [r.doc_id for r in docs_t.read(spark).collect()] == [1]
    roll_corpus_bands(docs_t.read(spark).select("doc_id", "text"),
                      band_path)
    assert read_corpus_bands(spark, band_path).count() == 4

    out = forget_documents(
        spark, catalog, [1], band_table_path=band_path,
        extra_tables=("bronze/documents_ingested",))
    # ingest-only deployment: no shard/hash tables -> skipped, and the
    # result names exactly the tables that committed a delete
    assert set(out) == {"bronze/documents_ingested", "corpus_bands"}
    assert read_corpus_bands(spark, band_path).count() == 0
    assert docs_t.read(spark).count() == 0

    # the same text re-submitted under a new id publishes — no ghost
    pq.write_table(pa.table({"doc_id": pa.array([2], type=pa.int64()),
                             "text": [text]}), stream_dir / "f2.parquet")
    near_dup_gated_ingest(
        spark.readStream.schema(schema).parquet(str(stream_dir)),
        catalog, str(tmp_path / "chk"), band_path,
    ).awaitTermination(120)
    assert [r.doc_id for r in docs_t.read(spark).collect()] == [2]
    qt = catalog.table("quarantine/near_dup_docs")
    assert (not qt.exists()) or qt.read(spark).count() == 0


def test_gated_ingest_collapses_replayed_doc_ids(spark, tmp_path):
    """A landing replay can put the same doc_id in one micro-batch
    twice; MERGE inserts one row per source duplicate, so prepare
    must collapse to one row per key (merge_into_table's documented
    contract — ADVICE r14). The max-full-row-struct rule keeps the
    lexicographically larger version, deterministically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from university_data_lakehouse_spark.plans.corpus import (
        near_dup_gated_ingest,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([7, 7], type=pa.int64()),
                  "text": ["replay version aa", "replay version bb"]}),
        stream_dir / "f1.parquet")
    catalog = TableCatalog(str(tmp_path / "lake"))
    near_dup_gated_ingest(
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(stream_dir)),
        catalog, str(tmp_path / "chk"), str(tmp_path / "bands"),
    ).awaitTermination(120)

    rows = catalog.table("bronze/documents_ingested").read(spark).collect()
    assert [(r.doc_id, r.text) for r in rows] == [(7, "replay version bb")]


def test_gated_ingest_flags_intra_batch_near_dups(spark, tmp_path):
    """Two near-duplicates arriving in the SAME micro-batch: before
    r15 both passed (the gate only checked the corpus band table) and
    the next roll admitted both permanently. The intra-batch pass
    keeps the LOWER doc_id and quarantines the higher with the lower
    as provenance; the unrelated doc in the batch still publishes.
    Runs with a never-materialized band table — also pinning the
    bootstrap semantic (ADVICE r14: a pre-roll start used to die in
    foreachBatch with an opaque FileNotFoundError)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from university_data_lakehouse_spark.plans.corpus import (
        near_dup_gated_ingest,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    text = "alpha bravo charlie delta echo foxtrot golf hotel"
    other = "quark lepton boson hadron gluon photon neutrino meson"
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([11, 12, 13], type=pa.int64()),
                  "text": [text, text, other]}),
        stream_dir / "f1.parquet")
    catalog = TableCatalog(str(tmp_path / "lake"))
    near_dup_gated_ingest(
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(stream_dir)),
        catalog, str(tmp_path / "chk"), str(tmp_path / "bands"),
    ).awaitTermination(120)

    published = {r.doc_id
                 for r in catalog.table("bronze/documents_ingested")
                 .read(spark).collect()}
    assert published == {11, 13}
    qrows = catalog.table("quarantine/near_dup_docs").read(spark).collect()
    assert [(r.doc_id, r._dup_of, r._dup_hamming, r._violated)
            for r in qrows] == [(12, 11, 0, "near_dup")]


def test_roll_corpus_bands_compaction_bounds_files(spark, tmp_path):
    """A year of nightly rolls must not accumulate unbounded small
    band files: roll_corpus_bands ends each roll with maybe_compact,
    so once the snapshot passes compact_max_files one bin-pack commit
    folds it back down — and the flagger's results are unchanged by
    the rewrite. vacuum() then physically reclaims the superseded
    fragments (explicit horizon: single-writer test)."""
    from university_data_lakehouse_spark.streaming.dedupe import (
        corpus_band_table,
        flag_near_dups,
        read_corpus_bands,
        roll_corpus_bands,
    )
    from university_data_lakehouse_spark.tables.format import ManagedTable

    path = str(tmp_path / "bands")
    schema = "doc_id long, text string"
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliett", "kilo", "lima"]
    docs = [(i, " ".join(words[(i + j) % len(words)] for j in range(8)))
            for i in range(12)]

    for i, (doc_id, text) in enumerate(docs):
        roll_corpus_bands(
            spark.createDataFrame([(doc_id, text)], schema), path,
            compact_max_files=4)
    tbl = ManagedTable(path)
    n_files = len(tbl.manifest()["files"])
    assert n_files <= 8, n_files       # bounded, not one-per-roll x32

    # compaction/no-compaction is invisible to the flagger: rolled ==
    # one-shot materialization, and flags match the definitional join
    rolled = {tuple(r) for r in read_corpus_bands(spark, path).collect()}
    full_df = corpus_band_table(spark.createDataFrame(docs, schema))
    assert rolled == {tuple(r) for r in full_df.collect()}
    probe = spark.createDataFrame([(100, docs[3][1])], schema)
    got = {tuple(r) for r in
           flag_near_dups(probe, read_corpus_bands(spark, path)).collect()}
    want = {tuple(r) for r in flag_near_dups(probe, full_df).collect()}
    assert got == want and (100, 3, 0) in got

    reclaimed = tbl.vacuum(keep_versions=1, min_age_seconds=0)
    assert reclaimed                  # superseded fragments deleted
    assert {tuple(r)
            for r in read_corpus_bands(spark, path).collect()} == rolled


def test_release_from_quarantine_restores_doc_with_provenance(
        spark, tmp_path):
    """The quarantine lifecycle closes (r15): a human-reviewed false
    positive releases from quarantine back into the published docs
    table KEEPING its _dup_of/_dup_hamming provenance (a non-null
    pair on a published row = "flagged, human-released"; gate-passed
    rows carry nulls), the released rows leave the quarantine table,
    and the doc then enters the normal roll: after roll_corpus_bands
    a near-dup of the RELEASED doc is flagged against it. Releasing
    unknown ids is a no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from university_data_lakehouse_spark.plans.corpus import (
        near_dup_gated_ingest,
        release_from_quarantine,
    )
    from university_data_lakehouse_spark.streaming.dedupe import (
        materialize_corpus_bands,
        roll_corpus_bands,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    text_a = "alpha bravo charlie delta echo foxtrot golf hotel"
    band_path = str(tmp_path / "bands")
    schema = "doc_id long, text string"
    materialize_corpus_bands(
        spark.createDataFrame([(1, text_a)], schema), band_path)

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([42], type=pa.int64()),
                             "text": [text_a]}), stream_dir / "f1.parquet")
    catalog = TableCatalog(str(tmp_path / "lake"))
    near_dup_gated_ingest(
        spark.readStream.schema(schema).parquet(str(stream_dir)),
        catalog, str(tmp_path / "chk"), band_path,
    ).awaitTermination(120)
    quar = catalog.table("quarantine/near_dup_docs")
    assert [r.doc_id for r in quar.read(spark).collect()] == [42]

    assert release_from_quarantine(spark, catalog, [999]) == {}  # no-op

    out = release_from_quarantine(spark, catalog, [42])
    assert set(out) == {"bronze/documents_ingested",
                        "quarantine/near_dup_docs"}
    docs = catalog.table("bronze/documents_ingested").read(spark).collect()
    assert [(r.doc_id, r.text, r._dup_of, r._dup_hamming)
            for r in docs] == [(42, text_a, 1, 0)]   # provenance kept
    assert quar.read(spark).count() == 0

    # released doc joins the normal roll and becomes dedup corpus
    roll_corpus_bands(
        catalog.table("bronze/documents_ingested").read(spark)
        .select("doc_id", "text"), band_path)
    pq.write_table(pa.table({"doc_id": pa.array([77], type=pa.int64()),
                             "text": [text_a]}), stream_dir / "f2.parquet")
    near_dup_gated_ingest(
        spark.readStream.schema(schema).parquet(str(stream_dir)),
        catalog, str(tmp_path / "chk"), band_path,
    ).awaitTermination(120)
    qrows = quar.read(spark).collect()
    assert len(qrows) == 1 and qrows[0].doc_id == 77
    assert qrows[0]._dup_of in (1, 42)   # closest match, both corpus now


def test_forget_band_purge_merge_on_read_path(spark, tmp_path):
    """RTBF at 100 TB uses deletion vectors: forgetting a handful of
    doc_ids scattered across terabyte band files must not rewrite
    them. merge_on_read=True flows through to the band-table delete —
    bytes stay in place, a DV sidecar hides the rows, the flagger
    stops matching the forgotten doc immediately, and compact+vacuum
    completes physical removal."""
    from university_data_lakehouse_spark.plans.corpus import (
        forget_documents,
    )
    from university_data_lakehouse_spark.streaming.dedupe import (
        flag_near_dups,
        materialize_corpus_bands,
        read_corpus_bands,
    )
    from university_data_lakehouse_spark.tables import TableCatalog
    from university_data_lakehouse_spark.tables.format import ManagedTable

    text_a = "alpha bravo charlie delta echo foxtrot golf hotel"
    text_b = "quark lepton boson hadron gluon photon neutrino meson"
    band_path = str(tmp_path / "bands")
    schema = "doc_id long, text string"
    materialize_corpus_bands(
        spark.createDataFrame([(1, text_a), (2, text_b)], schema),
        band_path)
    files_before = {f["name"]
                    for f in ManagedTable(band_path).manifest()["files"]}

    catalog = TableCatalog(str(tmp_path / "lake"))   # no corpus tables
    out = forget_documents(spark, catalog, [1], merge_on_read=True,
                           band_table_path=band_path)
    assert set(out) == {"corpus_bands"}
    m = ManagedTable(band_path).manifest()
    assert m["operation"] == "delete[mor]"
    assert {f["name"] for f in m["files"]} == files_before  # bytes kept
    assert any(f.get("dv") for f in m["files"])

    bands = read_corpus_bands(spark, band_path)
    assert {r.doc_id for r in bands.collect()} == {2}
    probe = spark.createDataFrame([(100, text_a)], schema)
    assert flag_near_dups(probe, bands).count() == 0   # ghost gone

    tbl = ManagedTable(band_path)
    tbl.compact(spark)
    assert not any(f.get("dv") for f in tbl.manifest()["files"])
    tbl.vacuum(keep_versions=1, min_age_seconds=0)
    assert {r.doc_id
            for r in read_corpus_bands(spark, band_path).collect()} == {2}


def test_release_takes_latest_quarantine_row_per_doc(spark, tmp_path):
    """A doc replayed across micro-batches quarantines more than
    once; release must merge exactly ONE row per released doc_id —
    taken ATOMICALLY (the winning row's own provenance fields ride
    along, never a cross-row mix) — or the docs-table MERGE would
    insert one row per historical quarantine entry.  This table was
    written directly WITHOUT the sink's _quarantine_seq stamp, so it
    also pins the LEGACY fallback: absent stamps, the winner is the
    deterministic max-full-row struct (see the temporal test below
    for the stamped path)."""
    from university_data_lakehouse_spark.plans.corpus import (
        release_from_quarantine,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    catalog = TableCatalog(str(tmp_path / "lake"))
    quar = catalog.table("quarantine/near_dup_docs")
    rows = spark.createDataFrame(
        [(5, "version one", 1, 2, "near_dup"),
         (5, "version two", 1, 1, "near_dup"),
         (6, "stays put", 1, 0, "near_dup")],
        "doc_id long, text string, _dup_of long, _dup_hamming int, "
        "_violated string")
    quar.write(rows, operation="quarantine")

    out = release_from_quarantine(spark, catalog, [5])
    assert set(out) == {"bronze/documents_ingested",
                        "quarantine/near_dup_docs"}
    docs = catalog.table("bronze/documents_ingested").read(spark).collect()
    assert [(r.doc_id, r.text, r._dup_of, r._dup_hamming)
            for r in docs] == [(5, "version two", 1, 1)]
    left = quar.read(spark).collect()
    assert [(r.doc_id, r.text) for r in left] == [(6, "stays put")]


def test_gated_corpus_graph_covers_ingest_loop(spark, tmp_path):
    """(r16, VERDICT r15 item 7) The Dagster-parity asset graph runs
    over the GATED ingest table: documents stream through
    near_dup_gated_ingest (one planted near-dup quarantined at the
    door), gated_corpus_graph materializes shards/stats from exactly
    the admitted rows, the bronze asset's quarantine_disjoint check
    reports the live quarantine state as check metadata, lineage
    payloads carry the ingest edge, and a doc_id appearing in BOTH
    the published and quarantine tables (the gate bypassed) fails the
    check and blocks the shard build downstream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from university_data_lakehouse_spark.operators.pipeline import (
        corpus_build_df,
    )
    from university_data_lakehouse_spark.plans.corpus import (
        gated_corpus_graph,
        near_dup_gated_ingest,
    )
    from university_data_lakehouse_spark.plans.lineage import (
        RecordingTransport,
        push_lineage,
    )
    from university_data_lakehouse_spark.streaming.dedupe import (
        materialize_corpus_bands,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    text_a = "alpha bravo charlie delta echo foxtrot golf hotel"
    novel = [
        "The quarterly report shows steady growth in renewable energy "
        "adoption across the region, with solar installations up by a "
        "third over the previous year.",
        "Researchers at the institute published findings on coastal "
        "erosion patterns, noting that sediment transport models now "
        "match observed shoreline changes closely.",
        "The library expanded its weekend hours after a community "
        "survey showed strong demand for evening study spaces among "
        "students and remote workers alike.",
        "A new bus route connecting the harbor district to the "
        "university campus began service this week, cutting average "
        "commute times by fifteen minutes.",
    ]
    band_path = str(tmp_path / "bands")
    materialize_corpus_bands(
        spark.createDataFrame([(1, text_a)], "doc_id long, text string"),
        band_path)

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    ids = [101, 102, 103, 104, 200]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": novel + [text_a],          # 200 = planted near-dup
        "lang": ["en"] * 5,
    }), stream_dir / "f1.parquet")
    catalog = TableCatalog(str(tmp_path / "lake"))
    near_dup_gated_ingest(
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(str(stream_dir)),
        catalog, str(tmp_path / "chk"), band_path,
    ).awaitTermination(120)

    g = gated_corpus_graph(catalog)
    publish = TableCatalog(str(tmp_path / "warehouse"))
    res = g.materialize(spark, str(tmp_path), catalog=publish)
    assert all(r.status == "ok" for r in res.values()), res
    bronze = res["bronze/documents_ingested"]
    assert bronze.rows == 4 and all(bronze.checks.values())
    # the quarantine seam reported as check metadata on the
    # materialization itself (Dagster check-result parity)
    assert bronze.check_meta["quarantine_disjoint"] == {
        "quarantined_rows": 1, "overlap_rows": 0}

    # shards are bit-identical to the one-shot build over exactly the
    # admitted rows, and the quarantined doc never reaches a shard
    admitted = catalog.table("bronze/documents_ingested").read(spark) \
        .drop("_dup_of", "_dup_hamming")
    expect = {tuple(r) for r in corpus_build_df(admitted).collect()}
    got = {tuple(r)
           for r in publish.table("gold/corpus_shards").read(spark)
           .collect()}
    assert got == expect and expect
    assert not any(r[0] == 200 for r in got)
    assert publish.table("gold/corpus_stats").read(spark).count() == 1

    # lineage carries the ingest edges
    send = RecordingTransport()
    push_lineage(g, send)
    edges = {(p["edge"]["fromEntity"]["fqn"], p["edge"]["toEntity"]["fqn"])
             for _, p in send.calls}
    assert ("bronze.documents_ingested", "gold.corpus_shards") in edges
    assert ("bronze.documents_ingested", "gold.corpus_stats") in edges

    # gate bypass: a published doc_id also sitting in quarantine
    # fails quarantine_disjoint and blocks the shard build
    quar = catalog.table("quarantine/near_dup_docs")
    bypass = quar.read(spark).limit(1).withColumn(
        "doc_id", F.lit(101).cast("long"))
    quar.write(bypass, mode="append")
    res2 = g.materialize(spark, str(tmp_path))
    b2 = res2["bronze/documents_ingested"]
    assert b2.status == "check_failed"
    assert b2.checks["quarantine_disjoint"] is False
    assert b2.check_meta["quarantine_disjoint"] == {
        "quarantined_rows": 2, "overlap_rows": 1}
    assert res2["gold/corpus_shards"].status == "skipped"
    assert res2["gold/corpus_stats"].status == "skipped"


def test_gated_corpus_tick_composes_ingest_roll_and_build(
        spark, tmp_path):
    """(r16) gated_corpus_tick is the nightly job as a first-class
    plan: drain the landing stream through the gate, roll ONLY the
    newly admitted docs into the band table (cursor = the band
    table's own doc_id footer stats), then run the corpus tick over
    the admitted table. Two ticks: the second tick's near-dup is
    flagged against a doc the FIRST tick rolled (the roll feeds the
    gate), rolls only its one new doc, and shards stay bit-identical
    to the one-shot build over everything admitted. A no-new-data
    tick is a rolled_docs=0 no-op, and a sub-cursor release rolls
    its own band rows eagerly (release_from_quarantine
    band_table_path) without being re-rolled by the next tick."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from university_data_lakehouse_spark.operators.pipeline import (
        corpus_build_df,
    )
    from university_data_lakehouse_spark.plans.corpus import (
        gated_corpus_tick,
        release_from_quarantine,
    )
    from university_data_lakehouse_spark.streaming.dedupe import (
        flag_near_dups,
        materialize_corpus_bands,
        read_corpus_bands,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    text_a = "alpha bravo charlie delta echo foxtrot golf hotel"
    novel = [
        "The quarterly report shows steady growth in renewable energy "
        "adoption across the region, with solar installations up by a "
        "third over the previous year.",
        "Researchers at the institute published findings on coastal "
        "erosion patterns, noting that sediment transport models now "
        "match observed shoreline changes closely.",
        "The library expanded its weekend hours after a community "
        "survey showed strong demand for evening study spaces among "
        "students and remote workers alike.",
        "A new bus route connecting the harbor district to the "
        "university campus began service this week, cutting average "
        "commute times by fifteen minutes.",
        "Volunteers planted over two thousand native trees along the "
        "river corridor, part of a decade-long effort to restore "
        "habitat for migratory birds.",
    ]
    band_path = str(tmp_path / "bands")
    schema = "doc_id long, text string, lang string"
    materialize_corpus_bands(
        spark.createDataFrame([(1, text_a)], "doc_id long, text string"),
        band_path)
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    catalog = TableCatalog(str(tmp_path / "lake"))

    def tick():
        return gated_corpus_tick(
            spark, catalog,
            spark.readStream.schema(schema).parquet(str(stream_dir)),
            str(tmp_path / "chk"), band_path)

    # tick 1: four novel docs admitted, one planted dup quarantined
    pq.write_table(pa.table({
        "doc_id": pa.array([101, 102, 103, 104, 200], type=pa.int64()),
        "text": novel[:4] + [text_a], "lang": ["en"] * 5,
    }), stream_dir / "f1.parquet")
    t1 = tick()
    assert t1["rolled_docs"] == 4 and "shards_version" in t1
    assert {r.doc_id for r in read_corpus_bands(spark, band_path)
            .select("doc_id").distinct().collect()} == {1, 101, 102,
                                                        103, 104}

    # tick 2: doc 301 duplicates doc 101's text -> flagged against
    # the doc the FIRST tick rolled; only doc 300 is new to the bands
    pq.write_table(pa.table({
        "doc_id": pa.array([300, 301], type=pa.int64()),
        "text": [novel[4], novel[0]], "lang": ["en", "en"],
    }), stream_dir / "f2.parquet")
    t2 = tick()
    assert t2["rolled_docs"] == 1
    qrows = {r.doc_id: r._dup_of for r in
             catalog.table("quarantine/near_dup_docs")
             .read(spark).collect()}
    assert qrows == {200: 1, 301: 101}

    admitted = catalog.table("bronze/documents_ingested").read(spark)
    assert {r.doc_id for r in admitted.select("doc_id").collect()} == {
        101, 102, 103, 104, 300}
    expect = {tuple(r) for r in corpus_build_df(
        admitted.drop("_dup_of", "_dup_hamming")).collect()}
    got = {tuple(r) for r in
           catalog.table("gold/corpus_shards").read(spark).collect()}
    assert got == expect and expect

    # no-new-data tick: pure no-op at the same shards version
    t3 = tick()
    assert t3["rolled_docs"] == 0
    assert t3["shards_version"] == t2["shards_version"]

    # sub-cursor release: 200 < the band cursor (300), so the next
    # tick would never roll it — release rolls its band rows eagerly
    rel = release_from_quarantine(spark, catalog, [200],
                                  band_table_path=band_path)
    assert "corpus_bands" in rel
    bands = read_corpus_bands(spark, band_path)
    assert 200 in {r.doc_id for r in
                   bands.select("doc_id").distinct().collect()}
    probe = spark.createDataFrame([(999, text_a)],
                                  "doc_id long, text string")
    assert {r.dup_of for r in flag_near_dups(probe, bands).collect()} \
        <= {1, 200} != set()
    t4 = tick()
    assert t4["rolled_docs"] == 0   # released doc not re-rolled


def test_release_winner_is_temporal_not_lexicographic(spark, tmp_path):
    """r16 (VERDICT r15 what's-wrong #1): "latest quarantine row" is
    a TEMPORAL fact, not a lexicographic one.  Doc 42 streams through
    the gated ingest twice — the SECOND payload is lexicographically
    SMALLER than the first (a strict prefix) but arrives in a later
    micro-batch; the sink stamps each quarantine append with the
    table's commit version (_quarantine_seq), and release picks the
    max stamp, so the temporally-later row wins where the old
    max(struct(text, ...)) rule would have resurrected version one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from university_data_lakehouse_spark.plans.corpus import (
        near_dup_gated_ingest,
        release_from_quarantine,
    )
    from university_data_lakehouse_spark.streaming.dedupe import (
        materialize_corpus_bands,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    text_a = "alpha bravo charlie delta echo foxtrot golf hotel"
    v1 = text_a + " alpha"   # repeated token: still hamming 0 vs text_a
    v2 = text_a              # strict prefix of v1 -> sorts BEFORE it
    assert v2 < v1
    band_path = str(tmp_path / "bands")
    schema = "doc_id long, text string"
    materialize_corpus_bands(
        spark.createDataFrame([(1, text_a)], schema), band_path)

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    catalog = TableCatalog(str(tmp_path / "lake"))
    for fname, text in (("f1.parquet", v1), ("f2.parquet", v2)):
        pq.write_table(
            pa.table({"doc_id": pa.array([42], type=pa.int64()),
                      "text": [text]}), stream_dir / fname)
        near_dup_gated_ingest(
            spark.readStream.schema(schema).parquet(str(stream_dir)),
            catalog, str(tmp_path / "chk"), band_path,
        ).awaitTermination(120)

    quar = catalog.table("quarantine/near_dup_docs")
    qrows = sorted(quar.read(spark).collect(),
                   key=lambda r: r._quarantine_seq)
    assert [(r.doc_id, r.text, r._quarantine_seq) for r in qrows] == [
        (42, v1, 1), (42, v2, 2)]   # stamp == commit version, monotone

    out = release_from_quarantine(spark, catalog, [42])
    assert set(out) == {"bronze/documents_ingested",
                        "quarantine/near_dup_docs"}
    docs = catalog.table("bronze/documents_ingested").read(spark).collect()
    # the temporally-later, lexicographically-smaller payload won,
    # with ITS OWN provenance, and the stamp stays quarantine-internal
    assert [(r.doc_id, r.text, r._dup_of, r._dup_hamming)
            for r in docs] == [(42, v2, 1, 0)]
    assert "_quarantine_seq" not in docs[0].asDict()
    assert quar.read(spark).count() == 0


def test_release_and_forget_empty_ids_are_noops(spark, tmp_path):
    """Empty doc_ids lists are uniform no-ops returning {} (r16,
    ADVICE r15): before the guard both functions raised ValueError
    from min()/max() — the one input class whose behavior diverged
    from the documented unknown-id/missing-table no-ops."""
    from university_data_lakehouse_spark.plans.corpus import (
        forget_documents,
        release_from_quarantine,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    catalog = TableCatalog(str(tmp_path / "lake"))
    assert release_from_quarantine(spark, catalog, []) == {}
    assert forget_documents(spark, catalog, []) == {}
    assert not catalog.table("quarantine/near_dup_docs").exists()
    assert not catalog.table("bronze/documents_ingested").exists()


def test_release_before_any_quarantine_is_a_noop(spark, tmp_path):
    """Releasing from a deployment that never quarantined anything
    (the quarantine table was never created) returns {} without
    touching or creating any table — the exists() guard, distinct
    from the known-table-unknown-id no-op."""
    from university_data_lakehouse_spark.plans.corpus import (
        release_from_quarantine,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    catalog = TableCatalog(str(tmp_path / "lake"))
    assert release_from_quarantine(spark, catalog, [1, 2]) == {}
    assert not catalog.table("quarantine/near_dup_docs").exists()
    assert not catalog.table("bronze/documents_ingested").exists()


def test_corpus_build_composes_with_gated_ingest(spark, tmp_path):
    """The §2.9 x §2.12 loop closes (r15): documents enter through
    near_dup_gated_ingest (a planted near-dup quarantined at the
    door), and incremental_corpus_build_from_table runs its ticks
    over the ADMITTED bronze table — two ticks over two ingest
    batches produce shards bit-identical to the one-shot build over
    everything that was admitted, and the quarantined doc never
    reaches a shard."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from university_data_lakehouse_spark.operators.pipeline import (
        corpus_build_df,
    )
    from university_data_lakehouse_spark.plans.corpus import (
        SHARDS_TABLE,
        incremental_corpus_build_from_table,
        near_dup_gated_ingest,
    )
    from university_data_lakehouse_spark.streaming.dedupe import (
        materialize_corpus_bands,
        roll_corpus_bands,
    )
    from university_data_lakehouse_spark.tables import TableCatalog

    text_a = "alpha bravo charlie delta echo foxtrot golf hotel"
    # ids/langs chosen to PASS the md5 sample gate (the corpus build
    # keeps a stratified subset; an all-filtered fixture would make
    # the equality below vacuous), texts to pass the quality gate
    texts = {
        3: "this is a small test document and it has some useful"
           " words in it for the gate",
        7: "we were there when the data was loaded and the results"
           " are in the table now",
        9: text_a,   # near-dup of the historical corpus -> quarantined
        14: "a document about the model and the data that it was"
            " trained on over the years",
        16: "the system can read and write files and it will not"
            " fail when the disk is full",
    }
    band_path = str(tmp_path / "bands")
    schema = "doc_id long, text string, lang string"
    materialize_corpus_bands(
        spark.createDataFrame([(900, text_a)], "doc_id long, text string"),
        band_path)

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    catalog = TableCatalog(str(tmp_path / "lake"))

    langs = {3: "en", 7: "en", 9: "en", 14: "en", 16: "de"}

    def ingest(ids, fname):
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": [texts[i] for i in ids],
                      "lang": [langs[i] for i in ids]}),
            stream_dir / fname)
        near_dup_gated_ingest(
            spark.readStream.schema(schema).parquet(str(stream_dir)),
            catalog, str(tmp_path / "chk"), band_path,
        ).awaitTermination(120)

    ingest([3, 7, 9], "f1.parquet")        # 2 admitted (9 = dup of 900)
    v1 = incremental_corpus_build_from_table(spark, catalog)
    roll_corpus_bands(
        catalog.table("bronze/documents_ingested").read(spark)
        .select("doc_id", "text"), band_path)
    ingest([14, 16], "f2.parquet")         # both admitted
    v2 = incremental_corpus_build_from_table(spark, catalog)
    assert v2 > v1

    admitted = catalog.table("bronze/documents_ingested").read(spark)
    assert {r.doc_id for r in admitted.collect()} == {3, 7, 14, 16}
    shards = catalog.table(SHARDS_TABLE).read(spark)
    got = {tuple(r) for r in shards.collect()}
    want = {tuple(r) for r in corpus_build_df(
        admitted.drop("_dup_of", "_dup_hamming")).collect()}
    assert got == want and len(got) > 0
    assert shards.where("doc_id = 9").count() == 0   # quarantined: no shard
