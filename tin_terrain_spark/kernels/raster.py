"""Raster grid kernels (dense 2-D ndarray + georef metadata).

The raster model mirrors the reference's Raster<double>
(/root/reference/include/tntn/Raster.h:55-548): row-major top-left
origin ndarray `z[h, w]`, with georeferencing (xpos, ypos = world coords
of the LOWER-LEFT corner, square cellsize, no-data sentinel). Pixel
centers: col2x(c) = xpos + (c+0.5)*cs, row2y(r) = ypos + (h-1-r+0.5)*cs
(Raster.h:419,457-461).

Kernels:
  integer_downsample_mean   src/raster_tools.cpp:15-60  (incl. the
                            `sum>0`-guard quirk: a window whose valid
                            sum is <= 0 keeps the no-data value)
  find_minmax               src/raster_tools.cpp:193-219
  sample_nearest_valid_avg  src/raster_tools.cpp:274-427 (expanding
                            Bresenham circles of 3x3 weighted samples)
  raster_bbox               Raster.h:301-312 (bbox spans pixel CENTERS)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_AVERAGING_SAMPLES = 64  # raster_tools.cpp:335


def is_no_data(z, ndv):
    """isnan(v) || v == ndv (Raster.h:520-523, TerraUtils.h:84-87)."""
    return np.isnan(z) | (z == ndv)


@dataclass
class Grid:
    """ndarray + georef: the in-kernel raster representation."""

    z: np.ndarray  # (h, w) float64, top-left origin, row-major
    xpos: float = 0.0  # world x of lower-left corner
    ypos: float = 0.0  # world y of lower-left corner
    cellsize: float = 1.0
    ndv: float = np.nan

    @property
    def h(self) -> int:
        return self.z.shape[0]

    @property
    def w(self) -> int:
        return self.z.shape[1]

    def col2x(self, c):
        return self.xpos + (np.asarray(c, dtype=np.float64) + 0.5) * self.cellsize

    def row2y(self, r):
        """top-left row index → world y (Raster.h:457-461)."""
        return self.ypos + (self.h - 1 - np.asarray(r, dtype=np.float64) + 0.5) * self.cellsize

    def x2col(self, x):
        """Round to nearest with C `(int)(0.5 + v)` truncation semantics
        (Raster.h:421-431)."""
        v = 0.5 + (np.asarray(x, dtype=np.float64) - self.xpos - 0.5 * self.cellsize) / self.cellsize
        return np.trunc(v).astype(np.int64)

    def y2row(self, y):
        """→ top-left row index (Raster.h:433-449)."""
        v = 0.5 + (np.asarray(y, dtype=np.float64) - self.ypos - 0.5 * self.cellsize) / self.cellsize
        r_ll = np.trunc(v).astype(np.int64)
        return self.h - 1 - r_ll

    def bbox(self):
        """Bounding box over pixel CENTERS — width = (w-1)*cs
        (Raster.h:301-312)."""
        return (
            self.col2x(0),
            self.row2y(self.h - 1),
            self.col2x(self.w - 1),
            self.row2y(0),
        )


def integer_downsample_mean(grid: Grid, win: int) -> Grid:
    """Mean over win×win windows of valid pixels; destination keeps ndv
    when the window has no valid pixels OR their sum is <= 0 (the
    reference's quirk, raster_tools.cpp:50-55). ndv test here is
    `!= ndv` without isnan, matching the reference (:44)."""
    h, w = grid.z.shape
    hs, ws = h // win, w // win
    src = grid.z[: hs * win, : ws * win]
    blocks = src.reshape(hs, win, ws, win)
    valid = blocks != grid.ndv
    if not np.isnan(grid.ndv):
        # NaN != ndv is True, so NaNs count as valid — replicate by
        # letting them poison sums exactly as the reference does.
        pass
    count = valid.sum(axis=(1, 3))
    s = np.where(valid, blocks, 0.0).sum(axis=(1, 3))
    out = np.full((hs, ws), grid.ndv, dtype=np.float64)
    write = (count > 0) & (s > 0)
    out[write] = s[write] / count[write]
    return Grid(out, grid.xpos, grid.ypos, grid.cellsize * win, grid.ndv)


def find_minmax(grid: Grid):
    """(min, max) ignoring no-data (raster_tools.cpp:193-219)."""
    valid = ~is_no_data(grid.z, grid.ndv)
    if not valid.any():
        return (np.nan, np.nan)
    v = grid.z[valid]
    return (float(v.min()), float(v.max()))


def _subsample_3x3(z: np.ndarray, ndv: float, r: int, c: int) -> float:
    """Weighted 3x3 subsample: center×3, cross-avg×2, diag-avg×1
    (raster_tools.cpp:274-323)."""
    h, w = z.shape

    def px(rr, cc):
        if 0 <= rr < h and 0 <= cc < w:
            v = z[rr, cc]
            return np.nan if v == ndv else v
        return np.nan

    center = px(r, c)
    cross = np.array([px(r - 1, c), px(r, c - 1), px(r, c + 1), px(r + 1, c)])
    diag = np.array(
        [px(r - 1, c - 1), px(r - 1, c + 1), px(r + 1, c - 1), px(r + 1, c + 1)]
    )
    cross_avg = np.nan if np.isnan(cross).all() else np.nanmean(cross)
    diag_avg = np.nan if np.isnan(diag).all() else np.nanmean(diag)
    weighted = np.array([center, center, center, cross_avg, cross_avg, diag_avg])
    if np.isnan(weighted).all():
        return np.nan
    return float(np.nanmean(weighted))


def sample_nearest_valid_avg(
    grid: Grid, row: int, col: int, min_samples: int = 1
) -> float:
    """Expanding Bresenham-circle search for valid samples
    (raster_tools.cpp:343-427). Returns NaN when nothing valid exists."""
    z = grid.z
    ndv = grid.ndv
    h, w = z.shape
    if 0 <= row < h and 0 <= col < w:
        v = z[row, col]
        if not (np.isnan(v) or v == ndv):
            return float(v)

    min_samples = min(min_samples, MAX_AVERAGING_SAMPLES)
    samples: list[float] = []

    def putpixel(x: int, y: int):
        if len(samples) >= MAX_AVERAGING_SAMPLES:
            return
        s = _subsample_3x3(z, ndv, row + y, col + x)
        if not (np.isnan(s) or s == ndv):
            samples.append(s)

    max_radius = int(np.sqrt(w * w + h * h))
    radius = 2
    while radius <= max_radius and len(samples) < min_samples:
        x, y = radius - 1, 0
        dx = dy = 1
        err = dx - (radius // 2)
        while x >= y:
            putpixel(x, y)
            putpixel(y, x)
            putpixel(-y, x)
            putpixel(-x, y)
            putpixel(-x, -y)
            putpixel(-y, -x)
            putpixel(y, -x)
            putpixel(x, -y)
            if err <= 0:
                y += 1
                err += dy
                dy += 2
            else:
                x -= 1
                dx += 2
                err += dx - (radius // 2)
        radius += 1

    if not samples:
        return np.nan
    if len(samples) == 1:
        return samples[0]
    return float(sum(samples) / len(samples))


def count_value(grid: Grid, v: float) -> int:
    """Raster::count (Raster.h:162-174)."""
    return int((grid.z == v).sum())
