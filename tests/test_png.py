"""Pure-NumPy PNG codec (kernels/png.py).

Every filter type (None/Sub/Up/Average/Paeth) is exercised by encoding
with that filter and decoding back to known pixels; a hand-built
fixture pins byte-level structure. The Spark-side mapInPandas path is
covered in test_spark_integration (needs a session)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tin_terrain_spark.kernels import png as P


def _img(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_every_filter_and_colortype(filt, channels):
    px = _img(13, 17, channels, seed=filt * 10 + channels)
    out = P.decode_png(P.encode_png(px, filters=filt))
    assert out.shape == px.shape
    assert np.array_equal(out, px)


def test_roundtrip_mixed_filters():
    px = _img(10, 9, 3, seed=7)
    out = P.decode_png(P.encode_png(px, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0]))
    assert np.array_equal(out, px)


def test_hand_built_fixture_known_pixels():
    """A 2x3 grayscale PNG assembled chunk-by-chunk by hand (not via
    encode_png) with filter 2 (Up) on row 2: decoded values must match
    the spec arithmetic exactly."""
    w, h = 3, 2
    row0 = bytes([0, 10, 20, 30])            # filter None
    row1 = bytes([2, 5, 5, 5])               # filter Up: +prev
    raw = zlib.compress(row0 + row1)

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )
    out = P.decode_png(data)
    assert out.shape == (2, 3, 1)
    assert out[:, :, 0].tolist() == [[10, 20, 30], [15, 25, 35]]


def test_gray_conversion():
    px = np.zeros((1, 2, 3), dtype=np.uint8)
    px[0, 0] = (255, 0, 0)
    px[0, 1] = (0, 255, 0)
    g = P.to_gray_f32(px)
    # integer ITU-R 601 luma then /256
    assert g[0, 0] == np.float32((255 * 299) // 1000 / 256.0)
    assert g[0, 1] == np.float32((255 * 587) // 1000 / 256.0)
    ga = P.to_gray_f32(_img(4, 4, 2, seed=3))
    assert ga.shape == (4, 4)


def test_rejections_are_loud():
    with pytest.raises(ValueError):
        P.decode_png(b"not a png at all")
    # corrupt streams raise ValueError too (never zlib/struct errors —
    # the single-type contract the multimodal fallback dispatch needs)
    good = P.encode_png(_img(6, 6, 1))
    with pytest.raises(ValueError):
        P.decode_png(good[:40])  # truncated mid-IHDR/IDAT
    garbage = bytearray(good)
    for i in range(45, min(60, len(garbage))):
        garbage[i] ^= 0xFF  # corrupt the IDAT body
    with pytest.raises(ValueError):
        P.decode_png(bytes(garbage))
    px = _img(4, 4, 1)
    good = P.encode_png(px)
    # depth flipped to 16 on an 8-bit stream: supported depth, but the
    # scanline length no longer matches -> loud
    bad = bytearray(good)
    bad[24] = 16
    with pytest.raises(ValueError):
        P.decode_png(bytes(bad))
    # color type flipped to palette without a PLTE chunk: loud
    bad = bytearray(good)
    bad[25] = 3
    with pytest.raises(ValueError):
        P.decode_png(bytes(bad))
    assert not P.is_png(b"\x00" * 20)


def test_multimodal_real_decode_uses_png():
    """The decode dispatch must return REAL pixels for PNG payloads in
    this container (no PIL): known-gradient image -> known pooled
    grayscale values, not the stub's hash pixels."""
    from tin_terrain_spark.operators import multimodal as M

    px = np.tile(np.arange(32, dtype=np.uint8)[None, :, None] * 8, (32, 1, 1))
    payload = P.encode_png(px, filters=2)
    got = M._decode_pixels(payload, 32, 32)
    expect = (px[:, :, 0].astype(np.float32)) / 256.0
    if M._HAS_PIL:  # PIL rounds luma differently on gray; shape check only
        assert got.shape == (32, 32)
    else:
        assert np.array_equal(got, expect)
    # non-PNG payloads keep the deterministic stub
    stub = M._decode_pixels(b"abcdef0123456789", 32, 32)
    assert stub.shape == (32, 32)
    assert not np.array_equal(stub, expect)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_16bit_gray(filt):
    """16-bit grayscale — the DEM-adjacent payload. Filters operate on
    BYTES with a 2-byte pixel offset; values must survive exactly."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 65536, size=(11, 9, 1)).astype(np.uint16)
    out = P.decode_png(P.encode_png(px, filters=filt))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, px)


def test_roundtrip_16bit_rgb():
    rng = np.random.RandomState(8)
    px = rng.randint(0, 65536, size=(5, 7, 3)).astype(np.uint16)
    out = P.decode_png(P.encode_png(px, filters=[0, 1, 2, 3, 4]))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, px)


def test_16bit_gray_conversion_scale():
    px = np.array([[[0], [32768], [65535]]], dtype=np.uint16)
    g = P.to_gray_f32(px)
    np.testing.assert_allclose(g[0], [0.0, 0.5, 65535 / 65536], rtol=0, atol=1e-7)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_palette(filt):
    rng = np.random.RandomState(9)
    palette = rng.randint(0, 256, size=(17, 3)).astype(np.uint8)
    idx = rng.randint(0, 17, size=(10, 8)).astype(np.uint8)
    out = P.decode_png(P.encode_png_palette(idx, palette, filters=filt))
    assert out.shape == (10, 8, 3)
    np.testing.assert_array_equal(out, palette[idx])


def test_roundtrip_palette_trns_alpha():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    trns = np.array([0, 128], dtype=np.uint8)  # entry 2 implicitly opaque
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    out = P.decode_png(P.encode_png_palette(idx, palette, trns=trns))
    assert out.shape == (2, 2, 4)
    np.testing.assert_array_equal(out[:, :, :3], palette[idx])
    np.testing.assert_array_equal(out[:, :, 3], [[0, 128], [255, 0]])


def test_palette_rejections():
    palette = np.zeros((4, 3), dtype=np.uint8)
    idx = np.zeros((3, 3), dtype=np.uint8)
    good = P.encode_png_palette(idx, palette)
    # sub-8-bit palette depth: loud
    bad = bytearray(good)
    bad[24] = 4
    with pytest.raises(ValueError):
        P.decode_png(bytes(bad))
    # index beyond the palette: loud at encode time
    with pytest.raises(ValueError):
        P.encode_png_palette(np.full((2, 2), 9, dtype=np.uint8), palette)
    # PLTE missing: loud (rebuild the stream without the PLTE chunk)
    no_plte = good[:33] + good[33 + 12 + 12 :]  # drop PLTE (12 hdr + 12 body)
    with pytest.raises(ValueError):
        P.decode_png(no_plte)


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_adam7_interlaced(channels, filt):
    """Adam7: 7 sequentially-filtered sub-images on the pass lattices,
    scattered back; odd sizes exercise empty/thin passes."""
    px = _img(13, 11, channels, seed=channels * 10 + filt)
    out = P.decode_png(P.encode_png(px, filters=filt, interlace=True))
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("size", [(1, 1), (2, 3), (8, 8), (9, 17)])
def test_adam7_sizes(size):
    h, w = size
    px = _img(h, w, 2, seed=h * 100 + w)
    out = P.decode_png(P.encode_png(px, filters=4, interlace=True))
    np.testing.assert_array_equal(out, px)


def test_adam7_16bit_and_palette():
    rng = np.random.RandomState(21)
    px16 = rng.randint(0, 65536, size=(10, 7, 1)).astype(np.uint16)
    out = P.decode_png(P.encode_png(px16, filters=3, interlace=True))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, px16)

    palette = rng.randint(0, 256, size=(9, 3)).astype(np.uint8)
    idx = rng.randint(0, 9, size=(12, 5)).astype(np.uint8)
    out = P.decode_png(P.encode_png_palette(idx, palette, filters=1,
                                            interlace=True))
    np.testing.assert_array_equal(out, palette[idx])
