"""Pure-NumPy baseline JPEG codec (kernels/jpeg.py).

Roundtrips are lossy by design: tests pin uniform (DC-only) images to
exact recovery, bound smooth-content error tightly at high quality,
and exercise every decode path the encoder can produce — grayscale /
RGB, 4:4:4 / 4:2:0, restart intervals, odd (non-MCU-aligned) sizes.
Rejections (progressive, 12-bit, CMYK, truncation, garbage) must raise
ValueError, never struct/index errors."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tin_terrain_spark.kernels import jpeg as J


def _smooth_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [np.minimum(yy * 3, 255), np.minimum(xx * 2, 255),
         np.minimum(yy + xx, 255)], axis=-1
    ).astype(np.uint8)


def test_uniform_exact():
    for v in (0, 90, 130, 255):
        px = np.full((16, 24), v, dtype=np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(px))
        assert out.shape == (16, 24, 1)
        assert int(np.abs(out[:, :, 0].astype(int) - v).max()) <= 1


def test_gray_gradient_tight():
    yy, xx = np.mgrid[0:32, 0:48]
    g = ((yy * 2 + xx) % 256).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(g, quality=90))
    assert int(np.abs(out[:, :, 0].astype(int) - g.astype(int)).max()) <= 2


@pytest.mark.parametrize("size", [(8, 8), (16, 16), (37, 53), (15, 9)])
def test_rgb_444_roundtrip(size):
    rgb = _smooth_rgb(*size)
    out = J.decode_jpeg(J.encode_jpeg(rgb, quality=90))
    assert out.shape == rgb.shape
    assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 3


@pytest.mark.parametrize("size", [(16, 16), (37, 53), (17, 31)])
def test_rgb_420_roundtrip(size):
    rgb = _smooth_rgb(*size)
    out = J.decode_jpeg(J.encode_jpeg(rgb, quality=90, subsample="420"))
    assert out.shape == rgb.shape
    # chroma is 2x2-averaged: looser bound, still tight on smooth data
    assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 8


@pytest.mark.parametrize("subsample,interval", [
    ("444", 1), ("444", 3), ("420", 2),
])
def test_restart_markers(subsample, interval):
    """DRI/RSTn streams decode identically to marker-free ones (the
    resync path resets DC predictors and realigns the bit reader)."""
    rgb = _smooth_rgb(37, 53)
    plain = J.decode_jpeg(J.encode_jpeg(rgb, quality=90, subsample=subsample))
    rst = J.decode_jpeg(
        J.encode_jpeg(rgb, quality=90, subsample=subsample,
                      restart_interval=interval)
    )
    np.testing.assert_array_equal(plain, rst)


def test_noise_bounded_by_quality():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(24, 24)).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(px, quality=95))
    err = np.abs(out[:, :, 0].astype(int) - px.astype(int))
    # noise is the worst case for DCT quantization; bound is loose but
    # catches gross pipeline errors (a broken zigzag scores ~80+)
    assert float(err.mean()) < 12.0


def test_rejections_are_loud():
    with pytest.raises(ValueError):
        J.decode_jpeg(b"not a jpeg")
    good = J.encode_jpeg(np.full((8, 8), 100, dtype=np.uint8))
    with pytest.raises(ValueError):
        J.decode_jpeg(good[:30])  # truncated
    # flip SOF0 -> SOF2 (progressive): loud. find the marker
    idx = good.index(b"\xff\xc0")
    prog = good[:idx] + b"\xff\xc2" + good[idx + 2 :]
    with pytest.raises(ValueError, match="baseline"):
        J.decode_jpeg(prog)
    # corrupt scan body -> wrapped ValueError (never KeyError/struct)
    bad = bytearray(good)
    for i in range(len(bad) - 20, len(bad) - 4):
        bad[i] ^= 0x55
    try:
        J.decode_jpeg(bytes(bad))
    except ValueError:
        pass  # loud is fine; a silently-wrong image is also acceptable
    assert not J.is_jpeg(b"\x00" * 10)


def test_multimodal_dispatch_uses_jpeg():
    from tin_terrain_spark.operators import multimodal as M

    if M._HAS_PIL:
        pytest.skip("PIL present")
    yy, xx = np.mgrid[0:32, 0:32]
    g = np.minimum(yy * 4 + xx, 255).astype(np.uint8)
    payload = J.encode_jpeg(g, quality=95)
    got = M._decode_pixels(payload, 32, 32)
    expect = g.astype(np.float32) / 256.0
    # lossy codec: pixel-level closeness, not equality
    assert got.shape == (32, 32)
    assert float(np.abs(got - expect).max()) < 4.0 / 256.0
    # non-image payloads still fall back to the stub
    stub = M._decode_pixels(b"abcdef0123456789", 32, 32)
    assert not np.allclose(stub, expect, atol=4.0 / 256.0)


@pytest.mark.parametrize("size", [(16, 16), (37, 53)])
def test_rgb_422_roundtrip(size):
    rgb = _smooth_rgb(*size)
    out = J.decode_jpeg(J.encode_jpeg(rgb, quality=90, subsample="422"))
    assert out.shape == rgb.shape
    assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 6
    rst = J.decode_jpeg(J.encode_jpeg(rgb, quality=90, subsample="422",
                                      restart_interval=2))
    np.testing.assert_array_equal(out, rst)
