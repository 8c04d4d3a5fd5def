"""Distributed ingestion of the reference's text raster/point formats.

The reference's dem2tin/dem2tintiles accept ESRI ASCII grids (.asc) and
whitespace XYZ point files next to GeoTIFF (src/cmd.cpp:77-110 format
dispatch; SurfacePoints.cpp:29-57 xyz load). kernels/meshio.py holds
the single-file parsers (the format semantics oracle); this module is
their Spark-native binding: `binaryFile` source → one decode task per
file → the same (path, x, y, z) cell stream geotiff_cells emits, so
every downstream operator (assign_tile_keys → mesh_tiles) is shared
across all three raster ingests.

Scale shape: file-granular parallelism (a 10^5-granule archive decodes
as 10^5 independent tasks), invalid samples dropped at the source so
only real points shuffle downstream — identical contract to
sources/geotiff.py.
"""

from __future__ import annotations

import numpy as np

from ..kernels.meshio import parse_asc, parse_xyz
from .geotiff import CELL_SCHEMA


def asc_cells(spark, path_glob: str):
    """ESRI ASCII grids → pixel-center world points DataFrame. Nodata
    and NaN cells are dropped at the source (same contract as
    geotiff_cells)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def decode(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                g = parse_asc(bytes(content).decode("ascii", "replace"))
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


def xyz_cells(spark, path_glob: str):
    """XYZ point files → world points DataFrame, with the reference's
    z ∈ [-10000, 10000] validity filter applied inside the parser."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def decode(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                pts = parse_xyz(bytes(content).decode("ascii", "replace"))
                yield pd.DataFrame(
                    {
                        "path": path,
                        "x": pts[:, 0],
                        "y": pts[:, 1],
                        "z": pts[:, 2],
                    }
                )

    return files.select("path", "content").mapInPandas(decode, CELL_SCHEMA)
