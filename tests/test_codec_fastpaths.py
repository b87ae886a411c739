"""r16 optimization pins: the vectorized codec fast paths must stay
bit-identical to the general paths they short-circuit.

Covers (OPTIMIZATION_r16.md):
- FLAC: table CRCs, numpy Rice write, set-bit-index Rice read, cumsum
  FIXED reconstruction, interleaved MD5 fold;
- JPEG/MPEG-1: the DC-only scalar IDCT short-circuit vs the full
  matmul, on blocks WITH and WITHOUT AC coefficients.
"""

from __future__ import annotations

import numpy as np
import pytest

from university_data_lakehouse_spark.operators import flac_codec as fc
from university_data_lakehouse_spark.operators import multimodal as mm


# ------------------------------------------------------------- FLAC

def test_flac_crc_tables_match_bitwise_definition():
    """Table-driven CRCs == the bit-at-a-time RFC definition."""
    def crc8_bitwise(data):
        crc = 0
        for b in data:
            crc ^= b
            for _ in range(8):
                crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                    else (crc << 1) & 0xFF
        return crc

    def crc16_bitwise(data):
        crc = 0
        for b in data:
            crc ^= b << 8
            for _ in range(8):
                crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                    else (crc << 1) & 0xFFFF
        return crc

    for seed in range(8):
        data = bytes((seed * 37 + i * 11) % 256 for i in range(257))
        assert fc._crc8(data) == crc8_bitwise(data)
        assert fc._crc16(data) == crc16_bitwise(data)
    assert fc._crc8(b"") == 0 and fc._crc16(b"") == 0


def test_flac_roundtrip_and_reader_position_parity():
    """encode → decode roundtrip across stereo modes and frame-size
    edges; the fast Rice reader must leave the stream consumable
    (CRC-16 verifies at the position the slow reader would reach)."""
    for i in (1, 7, 123, 399):
        ns = 100 + i % 400
        s = [((i * 31 + j * 7) % 4096) - 2048 for j in range(ns)]
        payload = fc.encode_flac([s], sample_rate=8000, blocksize=256)
        ch, sr = fc.flac_samples(payload)
        assert ch == [s] and sr == 8000
    left = [((7 * j) % 512) - 256 for j in range(300)]
    right = [((5 * j) % 300) - 150 for j in range(300)]
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        payload = fc.encode_flac([left, right], stereo_mode=mode)
        assert fc.flac_samples(payload) == ([left, right], 8000)
    for n in (1, 2, 3):                      # VERBATIM tiny frames
        payload = fc.encode_flac([[5] * n])
        assert fc.flac_samples(payload) == ([[5] * n], 8000)


def test_flac_fixed_reconstruct_matches_python_recurrence():
    """The cumsum path == the arbitrary-precision recurrence, and the
    overflow guard falls back to the recurrence on huge values."""
    rng = np.random.RandomState(3)
    for order in (1, 2, 3, 4):
        warm = [int(x) for x in rng.randint(-2000, 2000, order)]
        res = [int(x) for x in rng.randint(-5000, 5000, 200)]
        coefs = fc._FIXED_COEFS[order]
        out = list(warm)
        for v in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(pred + v)
        assert fc._fixed_reconstruct(warm, res, order) == out
    # guard path: residuals too large for the int64 bound
    warm = [1, 2]
    res = [1 << 50, -(1 << 50), 12345]
    coefs = fc._FIXED_COEFS[2]
    out = list(warm)
    for v in res:
        pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
        out.append(pred + v)
    assert fc._fixed_reconstruct(warm, res, 2) == out


def test_flac_interleaved_md5_bytes_match_to_bytes_loop():
    chans = [[-32768, -1, 0, 1, 32767], [5, -5, 100, -100, 12000]]
    for bps in (8, 16, 24, 32):
        lim = 1 << (bps - 1)
        cs = [[max(-lim, min(lim - 1, v)) for v in c] for c in chans]
        want = b"".join(
            int(c[j]).to_bytes(bps // 8, "little", signed=True)
            for j in range(5) for c in cs)
        assert fc._interleaved_le_bytes(cs, bps, 5) == want


# ----------------------------------------------------- JPEG / MPEG-1

def _jpeg_idct_reference(zz):
    coef = np.zeros((8, 8))
    for i, (r, c) in enumerate(mm._JPEG_ZIGZAG):
        coef[r, c] = zz[i]
    block = mm._JPEG_IDCT_M.T @ coef @ mm._JPEG_IDCT_M
    return np.clip(np.round(block) + 128, 0, 255)


def test_jpeg_dc_only_scalar_equals_matmul():
    """The DC-only short-circuit value == the full IDCT matmul for
    every representable DC level (the general path yields a constant
    block, the fast path returns that constant as a scalar)."""
    m0 = mm._JPEG_IDCT_M[0, 0]
    for dc in list(range(-1024, 1025, 7)) + [-1024, 1023]:
        ref = _jpeg_idct_reference([dc * 8] + [0] * 63)
        assert (ref == ref[0, 0]).all()
        val = min(max(round((m0 * float(dc * 8)) * m0) + 128.0, 0.0),
                  255.0)
        assert val == ref[0, 0], dc


def test_jpeg_blocks_with_ac_still_take_matmul_path():
    """A synthetic scan containing AC coefficients must decode through
    the general IDCT: reuse the hand-packed restart-marker fixture
    family by decoding a real baseline payload and checking features
    stay the closed form (any fast-path misfire would shift pixels)."""
    for i in (3, 17, 44):
        p = bytes(mm.synth_jpeg_payload(i))
        out = mm.decode_samples(p)
        w, h = out["width"], out["height"]
        pix = [(i * 3 + (j // w // 8) * (w // 8) + (j % w) // 8) % 256
               for j in range(w * h)]
        assert out["features"] == mm._chunk_means(pix)


def test_mpeg1_dc_only_scalar_equals_matmul():
    from university_data_lakehouse_spark.operators import mpeg1_codec as mc

    m0 = mc._IDCT_M[0, 0]
    for qdc in list(range(-256, 257, 3)):
        dc = max(-2048, min(2047, qdc * 8))
        coef = np.zeros((8, 8))
        coef[0, 0] = dc
        ref = np.clip(np.round(mc._IDCT_M.T @ coef @ mc._IDCT_M), 0, 255)
        assert (ref == ref[0, 0]).all()
        val = min(max(round((m0 * coef[0, 0]) * m0), 0.0), 255.0)
        assert val == ref[0, 0], qdc
