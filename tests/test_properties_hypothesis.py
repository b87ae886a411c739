"""Hypothesis property tests for the pure-Python deterministic
kernels (SURVEY §5.5) — no SparkSession needed, so these run in
milliseconds and cover input space the example tests can't:
cron matching, selection DSL algebra, byte-conf parsing, hex-key
sampling order, and the media header round trip."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from university_data_lakehouse_spark.functions.joins import parse_bytes
from university_data_lakehouse_spark.operators.multimodal import (
    parse_media_header,
    synth_media_payload,
)
from university_data_lakehouse_spark.plans.assets import Asset
from university_data_lakehouse_spark.plans.schedules import (
    cron_matches,
    next_run,
)
from university_data_lakehouse_spark.plans.selection import select_assets

# ---------------------------------------------------------------- cron

_minutes = st.integers(0, 59)
_cron_field = st.one_of(
    st.just("*"),
    st.integers(0, 59).map(str),
    st.tuples(st.integers(0, 30), st.integers(31, 59)).map(
        lambda t: f"{t[0]}-{t[1]}"
    ),
    st.integers(2, 30).map(lambda k: f"*/{k}"),
)


@given(minute=_cron_field, hour=st.one_of(st.just("*"), st.integers(0, 23).map(str)))
@settings(max_examples=60, deadline=None)
def test_next_run_matches_and_advances(minute, hour):
    cron = f"{minute} {hour} * * *"
    after = dt.datetime(2026, 3, 1, 12, 30)
    t = next_run(cron, after)
    assert t > after
    assert cron_matches(cron, t)
    # no earlier minute in (after, t) matches — spot-check a sample
    probe = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
    checked = 0
    while probe < t and checked < 120:
        assert not cron_matches(cron, probe)
        probe += dt.timedelta(minutes=1)
        checked += 1


# ------------------------------------------------------- selection DSL

_groups = st.sampled_from(["bronze", "silver", "gold", "ops"])
_assets = st.lists(
    st.tuples(st.integers(0, 999), _groups, st.sampled_from(["spark", "parquet"])),
    min_size=0, max_size=12, unique_by=lambda t: t[0],
).map(lambda rows: [
    Asset(key=f"{g}/a{i}", fn=lambda *_: None, group=g, kind=k,
          tags={"layer": g})
    for i, g, k in rows
])


@given(assets=_assets, g1=_groups, g2=_groups)
@settings(max_examples=60, deadline=None)
def test_selection_union_and_intersection_algebra(assets, g1, g2):
    union = select_assets(assets, f"group:{g1} | group:{g2}")
    inter = select_assets(assets, f"group:{g1} & tag:layer={g2}")
    a, b = set(select_assets(assets, f"group:{g1}")), set(
        select_assets(assets, f"group:{g2}"))
    assert set(union) == a | b
    assert set(inter) == (a & b if g1 == g2 else set())
    assert select_assets(assets, "*") == sorted(x.key for x in assets)


# -------------------------------------------------------- parse_bytes


@given(n=st.integers(0, 1 << 40),
       unit=st.sampled_from(["", "b", "k", "kb", "m", "mb", "g", "gb"]))
@settings(max_examples=80, deadline=None)
def test_parse_bytes_unit_roundtrip(n, unit):
    mult = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
            "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}[unit]
    assert parse_bytes(f"{n}{unit}") == n * mult


# --------------------------------------- hex sample keys order-isomorph


@given(a=st.integers(0, (1 << 32) - 1), b=st.integers(0, (1 << 32) - 1))
@settings(max_examples=100, deadline=None)
def test_hex_key_comparison_is_numeric_comparison(a, b):
    """sample_stratified's correctness rests on fixed-width lowercase
    hex comparing lexicographically == numerically."""
    assert (f"{a:08x}" < f"{b:08x}") == (a < b)


# ------------------------------------------------- media header parse


@given(doc_id=st.integers(0, 10**9),
       media=st.sampled_from(["image", "audio", "video"]))
@settings(max_examples=60, deadline=None)
def test_media_payload_roundtrip_any_doc_id(doc_id, media):
    payload = synth_media_payload(doc_id, media, "txt")
    meta = parse_media_header(payload)
    if media == "image":
        assert meta["width"] == 4 + doc_id % 16
        assert meta["height"] == 4 + (doc_id // 16) % 16
    elif media == "audio":
        assert meta["sample_rate"] == 8000 + (doc_id % 8) * 1000
        assert meta["n_samples"] == 100 + doc_id % 400
    else:
        assert all(v is None for v in meta.values())


@given(junk=st.binary(max_size=64))
@settings(max_examples=100, deadline=None)
def test_media_parser_never_raises_on_junk(junk):
    meta = parse_media_header(junk)
    assert set(meta) == {"width", "height", "sample_rate", "n_samples",
                         "duration_ms"}


@given(st.integers(min_value=0, max_value=10**9),
       st.sampled_from(["image", "audio"]))
@settings(max_examples=60, deadline=None)
def test_pixel_sample_decode_recovers_synth_formula(doc_id, media):
    """decode_samples reads REAL bytes: for any doc_id, the decoded
    chunk-mean features equal the synth formulas evaluated directly
    ((doc_id+i)%256 pixels, ((doc_id*31+i*7)%65536)-32768 samples)."""
    from university_data_lakehouse_spark.operators.multimodal import (
        _chunk_means,
        decode_samples,
        synth_media_payload,
    )

    payload = synth_media_payload(doc_id, media, "txt")
    d = decode_samples(payload)
    assert d is not None
    if media == "image":
        w, h = 4 + doc_id % 16, 4 + (doc_id // 16) % 16
        n = ((w * 3 + 3) & ~3) * h
        assert (d["width"], d["height"]) == (w, h)
        assert d["features"] == _chunk_means(
            [(doc_id + i) % 256 for i in range(n)])
    else:
        n = 100 + doc_id % 400
        assert d["n_frames"] == n
        assert d["features"] == _chunk_means(
            [abs(((doc_id * 31 + i * 7) % 65536) - 32768)
             for i in range(n)])


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=120, deadline=None)
def test_decode_samples_returns_none_on_junk(junk):
    """Arbitrary bytes either parse as a (coincidentally) valid
    uncompressed container or return None — never raise."""
    from university_data_lakehouse_spark.operators.multimodal import (
        decode_samples,
    )

    out = decode_samples(junk)
    assert out is None or set(out) == {"width", "height", "n_frames",
                                       "features"}


@given(st.lists(st.integers(min_value=0, max_value=65535), min_size=0,
                max_size=200))
@settings(max_examples=80, deadline=None)
def test_chunk_means_properties(vals):
    """8 chunks always; short inputs 0.0-pad; constant input -> the
    constant; every mean within [min, max] of its input."""
    from university_data_lakehouse_spark.operators.multimodal import (
        _chunk_means,
    )

    out = _chunk_means(vals)
    assert len(out) == 8
    if not vals:
        assert out == [0.0] * 8
        return
    lo, hi = min(vals), max(vals)
    step = max(len(vals) // 8, 1)
    for i, m in enumerate(out):
        chunk = vals[i * step:(i + 1) * step]
        if chunk:
            assert lo - 1e-9 <= m <= hi + 1e-9
        else:
            assert m == 0.0


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st


@_given(_st.lists(_st.text(alphabet="abc ", min_size=0, max_size=12),
                  min_size=0, max_size=8),
        _st.integers(min_value=2, max_value=4))
@_settings(max_examples=25, deadline=None)
def test_shingles_zip_form_matches_indexed_form(spark, toks, n):
    """r6: the zip-of-slices shingle rewrite must be byte-identical
    to the definitional indexed form (concat_ws over element_at) for
    any token list and n — including the short-doc empty case."""
    from pyspark.sql import Row, functions as F

    from university_data_lakehouse_spark.functions.textfns import shingles

    def indexed(tok_col, n, sep=" "):
        size = F.size(tok_col)
        idx = F.sequence(F.lit(1), size - (n - 1))
        make = F.transform(
            idx,
            lambda i: F.concat_ws(
                sep, *[F.element_at(tok_col, i + j) for j in range(n)]
            ),
        )
        return F.when(size >= n, make).otherwise(
            F.array().cast("array<string>"))

    df = spark.createDataFrame([Row(toks=toks)],
                               "toks array<string>")
    got = df.select(
        shingles(F.col("toks"), n).alias("a"),
        indexed(F.col("toks"), n).alias("b"),
    ).collect()[0]
    assert got.a == got.b
