"""Sinks: the reference's output formats as distributed writers.

  write_tile_tree   {out}/{z}/{x}/{y}.terrain quantized-mesh files
                    (dem2tintiles_workflow.cpp:134-148) — one file per
                    tile row, written from the executors
                    (foreachPartition), idempotent overwrite
  tiles_as_obj/off  per-tile OBJ / OFF text columns (MeshIO sinks) for
                    export pipelines — decode the terrain blob, format
                    in a pandas UDF batch
  write_asc         raster grid → ESRI ASC text (RasterIO.cpp:140-223)
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType


def write_tile_tree(tiles: DataFrame, out_dir: str) -> int:
    """Write Z/X/Y.terrain files from executors. Returns tile count.
    Idempotent: re-running overwrites the same paths."""
    n = tiles.count()

    def write_partition(rows):
        for r in rows:
            if r["terrain"] is None:
                continue
            d = os.path.join(out_dir, str(r["zoom"]), str(r["tile_x"]))
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".{r['tile_y']}.terrain.tmp")
            with open(tmp, "wb") as f:
                f.write(bytes(r["terrain"]))
            os.replace(tmp, os.path.join(d, f"{r['tile_y']}.terrain"))

    tiles.select("zoom", "tile_x", "tile_y", "terrain").foreachPartition(write_partition)
    return n


def _decode_format_udf(fmt: str):
    @F.pandas_udf(StringType())
    def decode_format(terrain: pd.Series) -> pd.Series:
        import numpy as np

        from ..kernels.codec import decode_qm_tile, dequantize_coordinate
        from ..kernels.meshio import format_geojson, format_obj, format_off

        out = []
        for blob in terrain:
            if blob is None:
                out.append(None)
                continue
            t = decode_qm_tile(bytes(blob))
            verts = np.column_stack(
                [
                    dequantize_coordinate(t.u, 0.0, 1.0),
                    dequantize_coordinate(t.v, 0.0, 1.0),
                    dequantize_coordinate(t.h, t.min_height, t.max_height),
                ]
            )
            if fmt == "obj":
                out.append(format_obj(verts, t.faces))
            elif fmt == "off":
                out.append(format_off(verts, t.faces))
            else:
                out.append(format_geojson(verts, t.faces))
        return pd.Series(out)

    return decode_format


def tiles_as_obj(tiles: DataFrame) -> DataFrame:
    return tiles.withColumn("obj", _decode_format_udf("obj")(F.col("terrain")))


def tiles_as_off(tiles: DataFrame) -> DataFrame:
    return tiles.withColumn("off", _decode_format_udf("off")(F.col("terrain")))


def tiles_as_geojson(tiles: DataFrame) -> DataFrame:
    return tiles.withColumn("geojson", _decode_format_udf("geojson")(F.col("terrain")))
