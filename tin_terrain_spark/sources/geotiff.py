"""GeoTIFF source (S1): the reference's primary raster input, without
GDAL.

A pure-NumPy reader for the GeoTIFF subset that DEM rasters actually
use — classic TIFF (little/big endian), single band, strip or tile
organization, compression none/deflate, horizontal predictor,
uint/int/float samples, ModelPixelScale + ModelTiepoint georef and the
GDAL_NODATA ascii tag — plus a minimal float32 writer (test fixtures /
export).

Load semantics mirror /root/reference/src/RasterIO.cpp:347-441:
band 1 only, cellsize = |scale_x|, pos = lower-left corner
(min of the transform corners), data flipped so the array stays
top-left row-major (flip x when scale_x < 0, flip y when scale_y > 0),
nodata from the band.

Spark integration: `geotiff_cells` reads files via the binaryFile
source (one task per file — decode parallelism = file count; for
100 TB inputs the raster set is many tiles/granules, which is exactly
this layout) and emits pixel-center world points, ready for
`assign_tile_keys` → cell aggregation → the meshing pipeline.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..kernels.raster import Grid

# TIFF field types → (struct fmt, size)
_TYPES = {
    1: ("B", 1),   # BYTE
    2: ("c", 1),   # ASCII
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    5: ("II", 8),  # RATIONAL
    6: ("b", 1),
    8: ("h", 2),
    9: ("i", 4),
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PREDICTOR = 317
_TAG_TILE_W = 322
_TAG_TILE_H = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_MODEL_PIXEL_SCALE = 33550
_TAG_MODEL_TIEPOINT = 33922
_TAG_GDAL_NODATA = 42113


def _read_ifd(buf: bytes, bo: str):
    (off,) = struct.unpack(bo + "I", buf[4:8])
    (n,) = struct.unpack(bo + "H", buf[off : off + 2])
    tags: dict[int, tuple] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(bo + "HHI", buf[e : e + 8])
        if typ not in _TYPES:
            continue
        fmt, sz = _TYPES[typ]
        total = sz * cnt
        if total <= 4:
            raw = buf[e + 8 : e + 8 + total]
        else:
            (voff,) = struct.unpack(bo + "I", buf[e + 8 : e + 12])
            raw = buf[voff : voff + total]
        if typ == 2:
            tags[tag] = raw.split(b"\x00")[0].decode("ascii", "replace")
        elif typ == 5:
            vals = struct.unpack(bo + "I" * (2 * cnt), raw)
            tags[tag] = tuple(vals[2 * j] / max(vals[2 * j + 1], 1) for j in range(cnt))
        else:
            tags[tag] = struct.unpack(bo + fmt * cnt, raw)
    return tags


def _dtype(bits: int, sample_format: int, bo: str) -> np.dtype:
    e = "<" if bo == "<" else ">"
    if sample_format == 3:
        return np.dtype(f"{e}f{bits // 8}")
    if sample_format == 2:
        return np.dtype(f"{e}i{bits // 8}")
    return np.dtype(f"{e}u{bits // 8}")


def _decode_block(raw: bytes, compression: int, dtype: np.dtype,
                  rows: int, cols: int, predictor: int) -> np.ndarray:
    if compression in (8, 32946):  # deflate (zlib)
        raw = zlib.decompress(raw)
    elif compression != 1:
        raise NotImplementedError(f"TIFF compression {compression} not supported "
                                  "(supported: none, deflate)")
    a = np.frombuffer(raw, dtype=dtype, count=rows * cols).reshape(rows, cols)
    if predictor == 2:
        a = np.cumsum(a.astype(np.int64), axis=1).astype(dtype)
    elif predictor not in (0, 1):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
    return a


def read_geotiff(data: bytes) -> Grid:
    """Parse GeoTIFF bytes → Grid (reference load semantics)."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    (magic,) = struct.unpack(bo + "H", data[2:4])
    if magic != 42:
        raise NotImplementedError("BigTIFF (magic 43) not supported")
    tags = _read_ifd(data, bo)

    w = int(tags[_TAG_WIDTH][0])
    h = int(tags[_TAG_HEIGHT][0])
    bits = int(tags.get(_TAG_BITS, (32,))[0])
    compression = int(tags.get(_TAG_COMPRESSION, (1,))[0])
    spp = int(tags.get(_TAG_SAMPLES_PER_PIXEL, (1,))[0])
    if spp != 1:
        raise NotImplementedError("multi-band GeoTIFF not supported (band 1 only "
                                  "in the reference too, RasterIO.cpp:387-394)")
    sample_format = int(tags.get(_TAG_SAMPLE_FORMAT, (1,))[0])
    predictor = int(tags.get(_TAG_PREDICTOR, (1,))[0])
    dtype = _dtype(bits, sample_format, bo)

    z = np.empty((h, w), dtype=np.float64)
    if _TAG_TILE_OFFSETS in tags:
        tw = int(tags[_TAG_TILE_W][0])
        th = int(tags[_TAG_TILE_H][0])
        offs = tags[_TAG_TILE_OFFSETS]
        cnts = tags[_TAG_TILE_COUNTS]
        tiles_x = (w + tw - 1) // tw
        for i, (o, c) in enumerate(zip(offs, cnts)):
            ty, tx = divmod(i, tiles_x)
            block = _decode_block(data[o : o + c], compression, dtype, th, tw, predictor)
            r0, c0 = ty * th, tx * tw
            rr, cc = min(th, h - r0), min(tw, w - c0)
            z[r0 : r0 + rr, c0 : c0 + cc] = block[:rr, :cc].astype(np.float64)
    else:
        offs = tags[_TAG_STRIP_OFFSETS]
        cnts = tags[_TAG_STRIP_COUNTS]
        rps = int(tags.get(_TAG_ROWS_PER_STRIP, (h,))[0])
        for i, (o, c) in enumerate(zip(offs, cnts)):
            r0 = i * rps
            rows = min(rps, h - r0)
            block = _decode_block(data[o : o + c], compression, dtype, rows, w, predictor)
            z[r0 : r0 + rows] = block.astype(np.float64)

    # georef (RasterIO.cpp:421-441 semantics)
    ps = tags.get(_TAG_MODEL_PIXEL_SCALE, (1.0, 1.0, 0.0))
    tp = tags.get(_TAG_MODEL_TIEPOINT, (0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    scale_x, scale_y = float(ps[0]), -float(ps[1])
    origin_x = float(tp[3]) - float(tp[0]) * scale_x
    origin_y = float(tp[4]) - float(tp[1]) * scale_y
    x2 = origin_x + w * scale_x
    y2 = origin_y + h * scale_y
    if scale_x < 0:
        z = z[:, ::-1]
    if scale_y > 0:
        z = z[::-1, :]
    ndv = np.nan
    if _TAG_GDAL_NODATA in tags:
        try:
            ndv = float(str(tags[_TAG_GDAL_NODATA]).strip())
        except ValueError:
            pass
    return Grid(
        np.ascontiguousarray(z),
        xpos=min(origin_x, x2),
        ypos=min(origin_y, y2),
        cellsize=abs(scale_x),
        ndv=ndv,
    )


def write_geotiff(grid: Grid, path: str, compress: bool = False) -> None:
    """Minimal single-band float32 GeoTIFF writer (classic, little-
    endian, one strip per raster, optional deflate) — enough for test
    fixtures and for exporting Grids to GDAL-readable files."""
    h, w = grid.z.shape
    payload = np.ascontiguousarray(grid.z, dtype="<f4").tobytes()
    if compress:
        payload = zlib.compress(payload)

    entries = []  # (tag, type, count, packed-value-or-bytes)

    def entry(tag, typ, cnt, vals):
        entries.append((tag, typ, cnt, vals))

    ndv_s = (b"nan" if np.isnan(grid.ndv) else repr(float(grid.ndv)).encode()) + b"\x00"
    entry(_TAG_WIDTH, 4, 1, (w,))
    entry(_TAG_HEIGHT, 4, 1, (h,))
    entry(_TAG_BITS, 3, 1, (32,))
    entry(_TAG_COMPRESSION, 3, 1, (8 if compress else 1,))
    entry(262, 3, 1, (1,))  # photometric: BlackIsZero
    entry(_TAG_STRIP_OFFSETS, 4, 1, None)  # patched below
    entry(_TAG_SAMPLES_PER_PIXEL, 3, 1, (1,))
    entry(_TAG_ROWS_PER_STRIP, 4, 1, (h,))
    entry(_TAG_STRIP_COUNTS, 4, 1, (len(payload),))
    entry(_TAG_SAMPLE_FORMAT, 3, 1, (3,))
    entry(_TAG_MODEL_PIXEL_SCALE, 12, 3, (grid.cellsize, grid.cellsize, 0.0))
    # tiepoint: raster (0,0) ↔ world top-left corner
    entry(_TAG_MODEL_TIEPOINT, 12, 6,
          (0.0, 0.0, 0.0, grid.xpos, grid.ypos + h * grid.cellsize, 0.0))
    entry(_TAG_GDAL_NODATA, 2, len(ndv_s), ndv_s)

    header = struct.pack("<2sHI", b"II", 42, 8)
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    overflow_off = 8 + ifd_size
    overflow = b""
    packed = []
    for tag, typ, cnt, vals in entries:
        fmt, sz = _TYPES[typ]
        if tag == _TAG_STRIP_OFFSETS:
            packed.append((tag, typ, cnt, None))
            continue
        if typ == 2:
            raw = vals
        else:
            raw = struct.pack("<" + fmt * cnt, *vals)
        if len(raw) <= 4:
            packed.append((tag, typ, cnt, raw.ljust(4, b"\x00")))
        else:
            packed.append((tag, typ, cnt, struct.pack("<I", overflow_off + len(overflow))))
            overflow += raw
    data_off = overflow_off + len(overflow)
    out = bytearray(header)
    out += struct.pack("<H", n)
    for tag, typ, cnt, raw in packed:
        if raw is None:
            raw = struct.pack("<I", data_off)
        out += struct.pack("<HHI", tag, typ, cnt) + raw
    out += struct.pack("<I", 0)  # next-IFD = none
    out += overflow
    out += payload
    with open(path, "wb") as f:
        f.write(bytes(out))


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

CELL_SCHEMA = "path STRING, x DOUBLE, y DOUBLE, z DOUBLE"


def geotiff_cells(spark, path_glob: str):
    """Raster files → pixel-center world points DataFrame. One decode
    task per file (binaryFile source); invalid (nodata/NaN) pixels are
    dropped at the source, so only real samples shuffle downstream."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def decode(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                g = read_geotiff(bytes(content))
                h, w = g.z.shape
                cols, rows = np.meshgrid(np.arange(w), np.arange(h))
                z = g.z.ravel()
                valid = ~(np.isnan(z) | (z == g.ndv))
                yield pd.DataFrame(
                    {
                        "path": path,
                        "x": g.col2x(cols.ravel()[valid]),
                        "y": g.row2y(rows.ravel()[valid]),
                        "z": z[valid],
                    }
                )

    return files.select("path", "content").mapInPandas(decode, CELL_SCHEMA)


def assign_tile_keys(points, zoom: int, grid_bits: int = 5):
    """Attach tile/cell keys to real (x, y) points — the raster-ingest
    twin of operators.geocode.geocode_points (which synthesizes x/y
    from ids). Output feeds operators.meshing.mesh_tiles unchanged."""
    from pyspark.sql import functions as F

    from ..functions import geocode_exprs as GX

    return (
        points.withColumn("tile_x", F.expr(GX.tile_sql("x", zoom)))
        .withColumn("tile_y", F.expr(GX.tile_sql("y", zoom)))
        .withColumn("cell_x", F.expr(GX.cell_sql("x", zoom, grid_bits)))
        .withColumn("cell_y", F.expr(GX.cell_sql("y", zoom, grid_bits)))
    )
