"""Pure-NumPy PNG codec (stdlib zlib + vectorized unfiltering).

This container ships no image libraries, so operators/multimodal.py's
real-decode branch could never execute; PNG is decodable with nothing
but zlib (stdlib) and NumPy, which makes the decode→feature path real
for one genuine format. Spec: the public PNG specification (RFC 2083 /
W3C PNG): IHDR/IDAT/IEND chunks, per-row filter byte, filters
0=None 1=Sub 2=Up 3=Average 4=Paeth.

Scope (loud rejection outside it): 8-bit depth, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace, no palette. That
covers the overwhelming share of ML-pipeline PNG payloads; palette /
16-bit raise ValueError so callers fall back (multimodal falls back to
its deterministic stub).

The row loop is sequential in H (filters are defined row-over-row) but
each row unfilters vectorized over W*C bytes except Sub/Paeth's
intra-row carry, which is O(W) per row in Python for Paeth only —
acceptable: the Arrow batch is the unit of decode parallelism, not the
pixel.

encode_png exists for fixtures/tests (choose the filter per row to
exercise every unfilter path) and for the multimodal sink side.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return len(data) > 8 and data[:8] == _MAGIC


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W, C). Raises ValueError on
    non-PNG bytes, unsupported variants, AND corrupt streams — the
    single exception type is the contract callers' fallback dispatch
    relies on (zlib/struct errors from truncated or garbage bodies are
    wrapped, never leaked into an executor)."""
    if not is_png(data):
        raise ValueError("not a PNG stream")
    try:
        return _decode_png_checked(data)
    except (zlib.error, struct.error, IndexError) as e:
        raise ValueError(f"corrupt PNG stream: {e}") from e


def _decode_png_checked(data: bytes) -> np.ndarray:
    width = height = None
    channels = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")

    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)  # headroom for the filter sums

    out = np.empty((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel (8-bit depth)
    zero_prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = filters[y]
        cur = rows[y]
        prev = out[y - 1].astype(np.int32) if y > 0 else zero_prev
        if f == 0:  # None
            line = cur
        elif f == 1:  # Sub: vectorized prefix-carry per pixel-column lane
            line = cur.copy()
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f == 3:  # Average
            line = cur.copy()
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            line = cur.copy()
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line.astype(np.uint8)
    return out.reshape(height, width, channels)


def to_gray_f32(px: np.ndarray) -> np.ndarray:
    """uint8 (H, W, C) -> float32 grayscale in [0, 1): integer ITU-R
    601 luma (the same weights PIL's convert("L") uses), exact integer
    arithmetic then /256 — deterministic across platforms."""
    px = px.astype(np.int64)
    c = px.shape[2]
    if c == 1:
        g = px[:, :, 0]
    elif c == 2:  # gray + alpha: alpha ignored (decode, not compositing)
        g = px[:, :, 0]
    else:  # RGB / RGBA
        g = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
    return (g.astype(np.float32)) / 256.0


def _paeth_row(line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    stride = line.shape[0]
    enc = np.empty(stride, dtype=np.uint8)
    for x in range(stride):
        a = int(line[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        enc[x] = (int(line[x]) - pred) & 0xFF
    return enc


def encode_png(px: np.ndarray, filters=None, level: int = 6) -> bytes:
    """uint8 (H, W) or (H, W, C) -> PNG bytes. `filters` picks the
    per-row filter type (int or list, default 0) so tests can exercise
    every unfilter path against known pixels."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    px = px.astype(np.uint8)
    if filters is None:
        filters = [0] * h
    elif isinstance(filters, int):
        filters = [filters] * h
    stride = w * c
    flat = px.reshape(h, stride)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(filters[y])
        cur = flat[y].astype(np.int32)
        if f == 0:
            enc = flat[y]
        elif f == 1:
            shifted = np.zeros(stride, dtype=np.int32)
            shifted[c:] = cur[:-c]
            enc = ((cur - shifted) & 0xFF).astype(np.uint8)
        elif f == 2:
            enc = ((cur - prev) & 0xFF).astype(np.uint8)
        elif f == 3:
            shifted = np.zeros(stride, dtype=np.int32)
            shifted[c:] = cur[:-c]
            enc = ((cur - ((shifted + prev) >> 1)) & 0xFF).astype(np.uint8)
        elif f == 4:
            enc = _paeth_row(flat[y], prev.astype(np.uint8), c)
        else:
            raise ValueError(f"bad filter {f}")
        lines.append(f)
        lines.extend(enc.tobytes())
        prev = cur
    raw = zlib.compress(bytes(lines), level)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw) + chunk(b"IEND", b"")
    )
