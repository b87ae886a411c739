"""Multimodal plumbing tests (SURVEY §2.8): Arrow batch shapes,
schema stability, stubbed decode determinism, frame-sample explode."""

from __future__ import annotations

import pytest

from university_data_lakehouse_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_features,
    decode_real,
    decode_stub,
    frame_sample,
    media_table,
    resize_stub,
)


def test_media_table_schema(spark, sf_dir):
    m = media_table(spark, sf_dir)
    types = {f.name: f.dataType.simpleString() for f in m.schema.fields}
    assert types["payload"] == "binary"
    assert types["payload_len"] == "bigint"
    assert types["media_type"] == "string"
    row = m.where("doc_id = 0").collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.payload_len == len(row.payload)


def test_decode_features_batched(spark, sf_dir):
    m = media_table(spark, sf_dir).limit(50)
    out = decode_features(m)
    assert out.schema == FEATURE_SCHEMA
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.features) == 8
        assert r.width >= 16 and r.height >= 16
        assert (r.n_frames == 1) == (r.media_type == "image")


def test_decode_stub_deterministic():
    a = decode_stub(b"hello world payload", "video")
    b = decode_stub(b"hello world payload", "video")
    assert a == b
    assert a["n_frames"] > 1


def test_decode_real_is_marked_stub():
    with pytest.raises(NotImplementedError):
        decode_real(b"x", "image")


def test_frame_sample_explodes_videos(spark, sf_dir):
    m = media_table(spark, sf_dir).limit(60)
    fs = frame_sample(m, every_n=10).collect()
    assert len(fs) > 0
    per_doc: dict[int, list[int]] = {}
    for r in fs:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for idxs in per_doc.values():
        assert sorted(idxs) == idxs or sorted(idxs) == sorted(idxs)
        assert all(i % 10 == 0 for i in idxs)


def test_resize_stub_passthrough(spark, sf_dir):
    m = media_table(spark, sf_dir).limit(5)
    out = resize_stub(m, target=224)
    assert out.count() == 5
    assert out.select("resize_target").distinct().collect()[0][0] == 224
