"""netpbm (PBM/PGM/PPM) + BMP codecs and their multimodal dispatch.

PGM is the DEM-adjacent text-raster format (plain grayscale
heightmaps); BMP the lowest-common-denominator raster. Both are exact
formats, so every test is value-exact: hand-built known-byte fixtures
plus encoder/decoder roundtrips, and the dispatch test drives
operators/multimodal._decode_real end-to-end including the (Geo)TIFF
branch through the engine's own reader.
"""

from __future__ import annotations

import numpy as np
import pytest

from tin_terrain_spark.kernels import bmp as B
from tin_terrain_spark.kernels import netpbm as N


# ------------------------------------------------------------ netpbm --


def test_pgm_raw_known_bytes():
    data = b"P5\n# a comment\n2 2\n255\n" + bytes([0, 64, 128, 255])
    px = N.decode_netpbm(data)
    assert px.shape == (2, 2, 1) and px.dtype == np.uint8
    assert px.reshape(-1).tolist() == [0, 64, 128, 255]


def test_pgm_16bit_big_endian():
    data = b"P5 2 1 65535\n" + bytes([0x01, 0x02, 0xFF, 0xFE])
    px = N.decode_netpbm(data)
    assert px.dtype == np.uint16
    assert px.reshape(-1).tolist() == [0x0102, 0xFFFE]


def test_plain_formats_and_comments():
    data = b"P2\n# c1\n3 2 # c2\n15\n0 5 10\n15 1 2\n"
    px = N.decode_netpbm(data)
    assert px.reshape(-1).tolist() == [0, 5, 10, 15, 1, 2]
    ppm = b"P3 1 2 255  1 2 3  4 5 6\n"
    px = N.decode_netpbm(ppm)
    assert px.shape == (2, 1, 3)
    assert px.reshape(-1).tolist() == [1, 2, 3, 4, 5, 6]


def test_pbm_plain_packed_digits_and_raw():
    # P1 pixels need no separators; 1 = black -> 0
    data = b"P1\n4 2\n0110\n1001\n"
    px = N.decode_netpbm(data)
    assert px.reshape(-1).tolist() == [
        255, 0, 0, 255, 0, 255, 255, 0
    ]
    # P4: row-packed MSB-first, rows byte-aligned
    raw = b"P4\n4 2\n" + bytes([0b01100000, 0b10010000])
    assert np.array_equal(N.decode_netpbm(raw), px)


@pytest.mark.parametrize("plain", [False, True])
@pytest.mark.parametrize("color", [False, True])
def test_roundtrip(plain, color):
    rng = np.random.RandomState(3)
    shape = (7, 5, 3) if color else (7, 5, 1)
    px = rng.randint(0, 256, size=shape).astype(np.uint8)
    out = N.decode_netpbm(N.encode_netpbm(px, plain=plain))
    assert np.array_equal(out, px)


def test_roundtrip_16bit():
    rng = np.random.RandomState(4)
    px = rng.randint(0, 65536, size=(5, 4, 1)).astype(np.uint16)
    out = N.decode_netpbm(N.encode_netpbm(px))
    assert out.dtype == np.uint16 and np.array_equal(out, px)


def test_netpbm_rejections():
    with pytest.raises(ValueError, match="magic"):
        N.decode_netpbm(b"P7\n1 1\n255\nx")
    with pytest.raises(ValueError, match="truncated"):
        N.decode_netpbm(b"P5 4 4 255\n\x00\x01")
    with pytest.raises(ValueError, match="maxval"):
        N.decode_netpbm(b"P5 1 1 0\n\x00")
    with pytest.raises(ValueError, match="exceeds"):
        N.decode_netpbm(b"P2 1 1 10\n200\n")


# --------------------------------------------------------------- bmp --


def test_bmp_roundtrip_with_stride_padding():
    rng = np.random.RandomState(5)
    for w in (1, 2, 3, 4, 5):  # every stride-padding residue
        px = rng.randint(0, 256, size=(4, w, 3)).astype(np.uint8)
        out = B.decode_bmp(B.encode_bmp(px))
        assert np.array_equal(out, px), f"w={w}"


def test_bmp_gray_input_expands():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = B.decode_bmp(B.encode_bmp(g))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def _bmp_bytes(w, h_raw, bpp, body, palette=b"", n_colors=0):
    import struct

    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h_raw, 1, bpp, 0, len(body),
        2835, 2835, n_colors, 0
    )
    off = 14 + 40 + len(palette)
    head = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return head + info + palette + body


def test_bmp_8bit_palette_bottom_up():
    # 2x2, palette {0: red, 1: green}; bottom-up rows, stride 4
    pal = bytes([0, 0, 255, 0]) + bytes([0, 255, 0, 0])  # BGRX
    body = bytes([1, 0, 0, 0]) + bytes([0, 1, 0, 0])  # bottom row first
    data = _bmp_bytes(2, 2, 8, body, pal, 2)
    out = B.decode_bmp(data)
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]],   # top row (file's second row: 0,1)
         [[0, 255, 0], [255, 0, 0]]], np.uint8
    )
    assert np.array_equal(out, want)


def test_bmp_1bit_and_4bit():
    pal = bytes([0, 0, 0, 0]) + bytes([255, 255, 255, 0])
    body = bytes([0b10100000, 0, 0, 0])  # one row: 1,0,1 (w=3)
    out = B.decode_bmp(_bmp_bytes(3, 1, 1, body, pal, 2))
    assert out[:, :, 0].reshape(-1).tolist() == [255, 0, 255]
    pal4 = b"".join(bytes([17 * i, 0, 0, 0]) for i in range(16))
    body4 = bytes([0x2F, 0x50, 0, 0])  # nibbles 2,15,5 (w=3)
    out4 = B.decode_bmp(_bmp_bytes(3, 1, 4, body4, pal4, 16))
    assert out4[:, :, 2].reshape(-1).tolist() == [34, 255, 85]


def test_bmp_32bit_alpha_and_legacy_bgrx():
    body = bytes([10, 20, 30, 128, 40, 50, 60, 255])  # BGRA x2
    out = B.decode_bmp(_bmp_bytes(2, 1, 32, body))
    assert out.shape == (1, 2, 4)
    assert out[0, 0].tolist() == [30, 20, 10, 128]
    legacy = bytes([10, 20, 30, 0, 40, 50, 60, 0])
    out = B.decode_bmp(_bmp_bytes(2, 1, 32, legacy))
    assert out.shape == (1, 2, 3)  # all-zero alpha -> BGRX -> RGB


def test_bmp_top_down():
    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    data = bytearray(B.encode_bmp(px))
    # flip to top-down: negate height, reorder rows
    import struct

    struct.pack_into("<i", data, 22, -2)
    body = data[54:]
    stride = len(body) // 2
    data[54:] = body[stride:] + body[:stride]
    assert np.array_equal(B.decode_bmp(bytes(data)), px)


def test_bmp_rejections():
    px = np.zeros((2, 2, 3), np.uint8)
    data = bytearray(B.encode_bmp(px))
    import struct

    struct.pack_into("<I", data, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        B.decode_bmp(bytes(data))
    data = bytearray(B.encode_bmp(px))
    struct.pack_into("<H", data, 28, 16)
    with pytest.raises(ValueError, match="16-bit"):
        B.decode_bmp(bytes(data))
    with pytest.raises(ValueError, match="signature"):
        B.decode_bmp(b"XX" + bytes(60))


# --------------------------------------------------- dispatch surface --


def test_decode_real_dispatch(tmp_path):
    from tin_terrain_spark.kernels.png import to_gray_f32
    from tin_terrain_spark.operators.multimodal import _decode_real

    rng = np.random.RandomState(6)
    gray = rng.randint(0, 256, size=(8, 8, 1)).astype(np.uint8)
    pnm = N.encode_netpbm(gray)
    got = _decode_real(pnm, 8, 8)
    assert np.allclose(got, to_gray_f32(gray))

    rgb = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
    got = _decode_real(B.encode_bmp(rgb), 8, 8)
    assert np.allclose(got, to_gray_f32(rgb))

    # (Geo)TIFF through the engine's own reader: min-max normalized
    from tin_terrain_spark.kernels.raster import Grid
    from tin_terrain_spark.sources.geotiff import write_geotiff

    z = np.linspace(0.0, 100.0, 16).reshape(4, 4)
    p = tmp_path / "t.tif"
    write_geotiff(Grid(z=z, xpos=0, ypos=0, cellsize=1.0), str(p))
    got = _decode_real(p.read_bytes(), 4, 4)
    assert got is not None and got.shape == (4, 4)
    want = (z - z.min()) / (z.max() - z.min()) * (255.0 / 256.0)
    assert np.allclose(got, want.astype(np.float32))

    assert _decode_real(b"not an image at all", 8, 8) is None


def test_synth_real_media_decode_identity():
    """Every synth_real_media format must decode (through the REAL
    codec path) back to the exact generator pixels — the local twin of
    the media_decode_real oracle query."""
    import hashlib

    from tin_terrain_spark.operators.multimodal import (
        REAL_MEDIA_FORMATS, _decode_real, synth_real_media,
    )

    assert synth_real_media is not None  # Spark surface; see gate query
    # build payloads via the same generator + encoders the operator runs
    for d in range(10):
        text = f"doc {d} text"
        seed = int(hashlib.sha256(text.encode()).hexdigest()[:14], 16)
        w, h = d * 37 % 12 + 4, d * 53 % 12 + 4
        r = np.arange(1, h + 1, dtype=np.int64)[:, None]
        c = np.arange(1, w + 1, dtype=np.int64)[None, :]
        v = (seed + r * 1315423911 + c * 2654435761) % 65521 % 256
        px = v.astype(np.uint8)
        k = d % 5
        from tin_terrain_spark.kernels import bmp as KB
        from tin_terrain_spark.kernels import gif as KG
        from tin_terrain_spark.kernels import netpbm as KN
        from tin_terrain_spark.kernels import png as KP

        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        payload = [
            lambda: KN.encode_netpbm(px),
            lambda: KN.encode_netpbm(px, plain=True),
            lambda: KB.encode_bmp(px),
            lambda: KP.encode_png(px),
            lambda: KG.encode_gif(px, pal),
        ][k]()
        got = _decode_real(payload, w, h)
        assert got is not None, REAL_MEDIA_FORMATS[k]
        want = (v / 256.0).astype(np.float32)
        assert np.array_equal(got, want), REAL_MEDIA_FORMATS[k]
