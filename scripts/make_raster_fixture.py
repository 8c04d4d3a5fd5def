"""Generate the committed GeoTIFF fixtures for the raster_tiles driver
query (S1): two tile-aligned 32x32 granules at zoom 3 — one plain, one
deflate-compressed — with deterministic integer-arithmetic heights.

Rerun only if the fixture recipe changes:
    python scripts/make_raster_fixture.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tin_terrain_spark.functions.geocode_exprs import HALF_CIRCUMFERENCE as HC  # noqa: E402
from tin_terrain_spark.kernels.raster import Grid  # noqa: E402
from tin_terrain_spark.sources.geotiff import write_geotiff  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "raster",
)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    tile_m = 2 * HC / 8  # zoom 3
    cs = tile_m / 32
    r = np.arange(32)[:, None]
    c = np.arange(32)[None, :]
    for i in range(2):
        z = (((r * 31 + c * 17 + i * 7) % 97)).astype(np.float64)
        g = Grid(
            z,
            xpos=-HC + i * tile_m,
            ypos=-HC + 2 * tile_m,
            cellsize=cs,
            ndv=-9999.0,
        )
        p = os.path.join(OUT, f"granule_{i}.tif")
        write_geotiff(g, p, compress=(i == 1))
        print(f"wrote {p} ({os.path.getsize(p)} bytes)")


if __name__ == "__main__":
    main()
