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


# ---------------------------------------------------------------------------
# sub-8-bit depths (1/2/4-bit grayscale + palette indices)
# ---------------------------------------------------------------------------

def test_pack_bits_is_msb_first():
    """Pin the spec's bit order independent of the pack/unpack pair:
    1-bit row [1,0,1,1,0,0,1,0] must pack to 0b10110010 = 0xB2."""
    row = np.array([[1, 0, 1, 1, 0, 0, 1, 0]], dtype=np.uint8)
    assert P._pack_bits(row, 1).tobytes() == b"\xb2"
    # 2-bit: [3,0,2,1] -> 0b11001001 = 0xC9 ; 4-bit: [0xA,0x5] -> 0xA5
    assert P._pack_bits(np.array([[3, 0, 2, 1]], dtype=np.uint8), 2).tobytes() == b"\xc9"
    assert P._pack_bits(np.array([[10, 5]], dtype=np.uint8), 4).tobytes() == b"\xa5"
    # padding bits at row end are zero: width 3 at depth 1 -> 0b10100000
    assert P._pack_bits(np.array([[1, 0, 1]], dtype=np.uint8), 1).tobytes() == b"\xa0"
    # unpack inverts (and drops padding)
    np.testing.assert_array_equal(
        P._unpack_bits(np.frombuffer(b"\xa0", dtype=np.uint8).reshape(1, 1), 3, 1),
        np.array([[1, 0, 1]], dtype=np.uint8),
    )


def test_hand_built_1bit_gray_fixture():
    """Fully hand-built 1-bit grayscale PNG (no encoder involved):
    8x2 checkerboard packed as 0xAA / 0x55, filter 0."""
    raw = zlib.compress(b"\x00\xaa\x00\x55")
    ihdr = struct.pack(">IIBBBBB", 8, 2, 1, 0, 0, 0, 0)
    data = (P._MAGIC + P._chunk(b"IHDR", ihdr) + P._chunk(b"IDAT", raw)
            + P._chunk(b"IEND", b""))
    out = P.decode_png(data)
    expect = np.zeros((2, 8, 1), dtype=np.uint8)
    expect[0, 0::2, 0] = 255
    expect[1, 1::2, 0] = 255
    np.testing.assert_array_equal(out, expect)


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_subbyte_gray(depth, filt):
    """Odd width (13) so row-end padding bits are exercised; decode
    returns the bit-replicated 8-bit display values."""
    rng = np.random.RandomState(depth * 10 + filt)
    s = rng.randint(0, 1 << depth, size=(9, 13)).astype(np.uint8)
    out = P.decode_png(P.encode_png(s, filters=filt, depth=depth))
    np.testing.assert_array_equal(
        out, (s * (255 // ((1 << depth) - 1)))[:, :, None]
    )


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_roundtrip_subbyte_palette(depth):
    rng = np.random.RandomState(depth)
    ncol = 1 << depth
    palette = rng.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
    idx = rng.randint(0, ncol, size=(11, 7)).astype(np.uint8)
    out = P.decode_png(P.encode_png_palette(idx, palette, filters=4, depth=depth))
    np.testing.assert_array_equal(out, palette[idx])
    # with tRNS alpha
    trns = rng.randint(0, 256, size=(min(3, ncol),)).astype(np.uint8)
    out = P.decode_png(P.encode_png_palette(idx, palette, trns=trns, depth=depth))
    alpha = np.full(ncol, 255, dtype=np.uint8)
    alpha[: len(trns)] = trns
    np.testing.assert_array_equal(out, np.dstack([palette[idx], alpha[idx]]))


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("size", [(1, 1), (3, 2), (7, 9), (10, 13)])
def test_subbyte_adam7(depth, size):
    """Adam7 + sub-byte: every pass has its own bit-packed rows."""
    h, w = size
    rng = np.random.RandomState(h * 31 + w + depth)
    s = rng.randint(0, 1 << depth, size=(h, w)).astype(np.uint8)
    out = P.decode_png(P.encode_png(s, filters=1, depth=depth, interlace=True))
    np.testing.assert_array_equal(
        out, (s * (255 // ((1 << depth) - 1)))[:, :, None]
    )
    ncol = 1 << depth
    palette = rng.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
    idx = rng.randint(0, ncol, size=(h, w)).astype(np.uint8)
    out = P.decode_png(P.encode_png_palette(idx, palette, filters=2,
                                            depth=depth, interlace=True))
    np.testing.assert_array_equal(out, palette[idx])


def test_subbyte_rejections():
    # sub-byte RGB is illegal per spec
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)
    data = (P._MAGIC + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(b"\x00" * 9))
            + P._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="illegal for color type"):
        P.decode_png(data)
    # encoder guards
    with pytest.raises(ValueError, match="out of range"):
        P.encode_png(np.full((2, 2), 4, dtype=np.uint8), depth=2)
    with pytest.raises(ValueError, match="single-channel"):
        P.encode_png(np.zeros((2, 2, 3), dtype=np.uint8), depth=4)
    with pytest.raises(ValueError, match="does not fit"):
        P.encode_png_palette(
            np.zeros((2, 2), dtype=np.uint8),
            np.zeros((5, 3), dtype=np.uint8), depth=2,
        )
    # depth 3 is not a legal PNG depth
    with pytest.raises(ValueError):
        P.encode_png_palette(
            np.zeros((2, 2), dtype=np.uint8),
            np.zeros((2, 3), dtype=np.uint8), depth=3,
        )
