"""Pure-NumPy BMP codec (Windows DIB, BITMAPINFOHEADER family).

Spec: the public Windows bitmap file format. Scope: uncompressed
(BI_RGB) 1/4/8-bit paletted, 24-bit BGR and 32-bit BGRA, bottom-up
and top-down rows, BITMAPINFOHEADER (40) and the larger V4/V5 headers
(extra fields ignored — they only add color-space metadata); BI_RLE /
BI_BITFIELDS and 16-bit raise ValueError so operators/multimodal.py
falls back to its stub. decode_bmp returns (H, W, C) uint8 with C=3
(or 4 for 32-bit with any nonzero alpha) — the kernels/png.py shape
contract. encode_bmp writes 24-bit BI_RGB for fixtures and the sink
side.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(data: bytes) -> bool:
    return len(data) > 54 and data[:2] == b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    if not is_bmp(data):
        raise ValueError("bmp: bad signature")
    px_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"bmp: core/old header size {hdr_size} unsupported")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    n_colors = struct.unpack("<I", data[46:50])[0]
    if planes != 1:
        raise ValueError(f"bmp: planes {planes}")
    if compression != 0:
        raise ValueError(f"bmp: compression {compression} unsupported")
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"bmp: {bpp}-bit unsupported")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError("bmp: bad dimensions")
    stride = ((w * bpp + 31) // 32) * 4
    if px_off + stride * h > len(data):
        raise ValueError("bmp: truncated pixel data")
    rows = np.frombuffer(
        data[px_off:px_off + stride * h], dtype=np.uint8
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp <= 8:
        if not n_colors:
            n_colors = 1 << bpp
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off:pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        if bpp == 8:
            idx = rows[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1)
            if bpp == 4:
                idx = (bits[:, 0::4] * 8 + bits[:, 1::4] * 4
                       + bits[:, 2::4] * 2 + bits[:, 3::4])[:, :w]
            else:
                idx = bits[:, :w]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("bmp: index outside palette")
        return pal[idx]
    n = bpp // 8
    img = rows[:, : w * n].reshape(h, w, n)
    if n == 3:
        return img[:, :, ::-1].copy()  # BGR -> RGB
    bgra = img
    rgba = np.empty_like(bgra)
    rgba[:, :, 0] = bgra[:, :, 2]
    rgba[:, :, 1] = bgra[:, :, 1]
    rgba[:, :, 2] = bgra[:, :, 0]
    rgba[:, :, 3] = bgra[:, :, 3]
    if not rgba[:, :, 3].any():  # alpha plane all-zero: legacy BGRX
        return rgba[:, :, :3].copy()
    return rgba


def encode_bmp(px: np.ndarray) -> bytes:
    """(H, W) gray / (H, W, 3) RGB uint8 → 24-bit bottom-up BI_RGB."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("bmp: need (H,W) or (H,W,3) uint8")
    h, w = px.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    body = rows.tobytes()
    header = b"BM" + struct.pack(
        "<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body
