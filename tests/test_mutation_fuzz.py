"""Mutation fuzz over every decodable media format.

The existing junk fuzzers (test_multimodal / test_mpa / test_mpeg1)
feed random bytes, which rarely survive the magic checks — they probe
the dispatch layer, not the decoders. Real-world corruption is a VALID
stream with a few flipped, missing, or inserted bytes; that is also
the shape every malformed-stream bug found in review rounds had
(truncated strf headers, spec-invalid escape levels, partial
macroblock cover). This suite generates a valid payload from each
synth generator, applies 1-3 byte-level mutations, and asserts the
decode stays inside the null-row boundary contract:

  1. it returns None, or a well-formed result (``features`` is None or
     exactly 8 floats; dims are ints or None), or raises one of
     ``_DECODE_ERRORS`` — never TypeError / UnboundLocalError /
     MemoryError / ZeroDivisionError or any other escape the Spark
     boundary (multimodal._samples_or_null) would not convert to a
     null row, where it would fail the whole task;
  2. it terminates promptly — a mutated length field must not make the
     decoder loop or allocate proportionally to the CLAIMED size (the
     r10 MPEG-1 header-amplification fix is the precedent); a 5 s
     wall cap catches slow-but-finite decodes, and a SIGALRM guard
     converts an actual infinite loop into a test failure (a post-hoc
     clock check alone would hang pytest silently).

Each format's generator here is the same one its oracle pipeline uses,
so a contract violation found by this fuzz is a real operator bug.
"""

from __future__ import annotations

import contextlib
import signal
import time

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from university_data_lakehouse_spark.operators import multimodal as mm
from university_data_lakehouse_spark.operators.mpa_codec import decode_mpa_l1

# name -> payload builder (doc_id -> bytes). One entry per format the
# feature pass can decode, built by the same synth the oracles use.
_GENERATORS = {
    "bmp": lambda d: mm.synth_media_payload(d, "image", ""),
    "wav": lambda d: mm.synth_media_payload(d, "audio", ""),
    "png": mm.synth_png_payload,
    "gif": mm.synth_gif_payload,
    "jpeg": mm.synth_jpeg_payload,
    "jpeg_color": mm.synth_jpeg_color_payload,
    "jpeg_420": mm.synth_jpeg_420_payload,
    "jpeg_prog": mm.synth_jpeg_prog_payload,
    "adpcm": mm.synth_adpcm_payload,
    "mulaw": mm.synth_mulaw_payload,
    "alaw": mm.synth_alaw_payload,
    "flac": mm.synth_flac_payload,
    "avi": mm.synth_avi_payload,
    "mjpeg": mm.synth_mjpeg_payload,
    "y4m": mm.synth_y4m_payload,
    "mpeg1": mm.synth_mpeg1_payload,
}

# A single mutation: (op, position-fraction, value). Fractions keep the
# drawn op valid for any payload length.
_mutation = st.tuples(
    st.sampled_from(["flip", "truncate", "delete", "insert", "zero"]),
    st.floats(0.0, 1.0, allow_nan=False),
    st.integers(0, 255),
)


@contextlib.contextmanager
def _hang_guard(seconds: int = 10):
    """Convert a NON-terminating decode into a test failure: the
    post-hoc wall-clock assert can only catch slow decodes that
    return; an actual infinite loop would hang pytest silently.
    SIGALRM fires inside the loop and raises out as an error the
    decode contract does not allow."""

    def _fire(signum, frame):
        raise AssertionError(f"decode did not terminate in {seconds}s")

    old = signal.signal(signal.SIGALRM, _fire)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _apply(payload: bytes, mutations) -> bytes:
    buf = bytearray(payload)
    for op, frac, val in mutations:
        if not buf:
            break
        pos = min(int(frac * len(buf)), len(buf) - 1)
        if op == "flip":
            buf[pos] ^= val or 0xFF
        elif op == "truncate":
            del buf[pos:]
        elif op == "delete":
            del buf[pos]
        elif op == "insert":
            buf.insert(pos, val)
        else:  # zero a short range — simulates a lost disk sector
            buf[pos:pos + 16] = b"\x00" * min(16, len(buf) - pos)
    return bytes(buf)


def _assert_well_formed(out) -> None:
    if out is None:
        return
    assert isinstance(out, dict)
    feats = out.get("features")
    assert feats is None or (len(feats) == 8
                             and all(isinstance(f, float) for f in feats))
    for k in ("width", "height", "n_frames"):
        v = out.get(k)
        assert v is None or isinstance(v, int)


def test_mutated_valid_payloads_stay_inside_decode_contract():
    @settings(max_examples=400, deadline=None)
    @given(
        fmt=st.sampled_from(sorted(_GENERATORS)),
        doc_id=st.integers(0, 10**6),
        mutations=st.lists(_mutation, min_size=1, max_size=3),
    )
    def check(fmt, doc_id, mutations):
        payload = _apply(_GENERATORS[fmt](doc_id), mutations)
        t0 = time.monotonic()
        with _hang_guard():
            try:
                out = mm.decode_samples(payload)
            except mm._DECODE_ERRORS:
                out = None
        assert time.monotonic() - t0 < 5.0, (
            f"{fmt}: decode of a {len(payload)}-byte mutated payload "
            "took >5s — a claimed-size amplification escape")
        _assert_well_formed(out)
        # the Spark-side header pass must survive the same bytes
        hdr = mm.parse_media_header(payload)
        assert isinstance(hdr, dict)

    check()


def test_mutated_mpa_frames_stay_inside_decode_contract():
    """Layer I is dispatched by its own pipeline (no magic branch in
    decode_samples), so fuzz its decoder directly. Contract per its
    junk fuzz: dict with n_frames >= 1, None, or ValueError."""

    @settings(max_examples=150, deadline=None)
    @given(
        doc_id=st.integers(0, 10**6),
        mutations=st.lists(_mutation, min_size=1, max_size=3),
    )
    def check(doc_id, mutations):
        payload = _apply(mm.synth_mpa_payload(doc_id), mutations)
        t0 = time.monotonic()
        with _hang_guard():
            try:
                out = decode_mpa_l1(payload)
                assert out is None or out["n_frames"] >= 1
            except ValueError:
                pass
        assert time.monotonic() - t0 < 5.0

    check()


def test_truncation_sweep_every_format():
    """Exhaustive single-op coverage the random fuzz only samples:
    every prefix-truncation point of one valid payload per format.
    Truncation is the highest-yield corruption (every historical
    malformed-stream finding involved a length/extent mismatch)."""
    for fmt, gen in _GENERATORS.items():
        payload = gen(7)
        step = max(1, len(payload) // 64)  # ~64 cut points per format
        for cut in range(0, len(payload), step):
            with _hang_guard():
                try:
                    out = mm.decode_samples(payload[:cut])
                except mm._DECODE_ERRORS:
                    out = None
            _assert_well_formed(out)
    # mpa dispatches through its own pipeline (no magic branch in
    # decode_samples) — its frame walk is BUILT from extent checks, so
    # the truncation sweep matters most there; cut at EVERY byte
    payload = mm.synth_mpa_payload(7)
    for cut in range(len(payload)):
        with _hang_guard():
            try:
                out = decode_mpa_l1(payload[:cut])
                assert out is None or out["n_frames"] >= 1
            except ValueError:
                pass
