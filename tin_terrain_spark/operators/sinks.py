"""Sinks: the reference's output formats as distributed writers.

  write_tile_store    cluster-safe tile sink: ONE DataFrame-writer job
                      into a zoom/tile_x-partitioned parquet store (any
                      Hadoop-compatible FS / object store; partition
                      pruning serves single-tile reads)
  materialize_tile_tree
                      parquet store → {out}/{z}/{x}/{y}.terrain file
                      tree (dem2tintiles_workflow.cpp:134-148) on the
                      DRIVER's filesystem — the explicit local step for
                      single-node serving; streams via toLocalIterator
  write_tile_tree     facade: store + materialize (local-mode
                      convenience, same signature as before)
  tiles_as_obj/off    per-tile OBJ / OFF text columns (MeshIO sinks) for
                      export pipelines — decode the terrain blob, format
                      in a pandas UDF batch
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType


def write_tile_store(tiles: DataFrame, store_dir: str) -> None:
    """Cluster-safe tile sink: one writer job, no executor-local paths.
    The layout (partitioned by zoom, tile_x) makes per-tile lookups a
    partition-pruned scan and per-zoom exports a directory listing —
    the distributed analogue of the reference's z/x/y file tree."""
    (
        tiles.filter(F.col("terrain").isNotNull())
        .select("zoom", "tile_x", "tile_y", "terrain")
        .write.mode("overwrite")
        .partitionBy("zoom", "tile_x")
        .parquet(store_dir)
    )


def materialize_tile_tree(spark: SparkSession, store_dir: str, out_dir: str) -> int:
    """{z}/{x}/{y}.terrain files (dem2tintiles_workflow.cpp:134-148)
    from the parquet store, on the driver-local filesystem. Streams
    partition-by-partition (toLocalIterator) — never collects the full
    store. Returns the tile count; idempotent overwrite."""
    df = spark.read.parquet(store_dir).select("zoom", "tile_x", "tile_y", "terrain")
    n = 0
    for r in df.toLocalIterator():
        d = os.path.join(out_dir, str(r["zoom"]), str(r["tile_x"]))
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{r['tile_y']}.terrain.tmp")
        with open(tmp, "wb") as f:
            f.write(bytes(r["terrain"]))
        os.replace(tmp, os.path.join(d, f"{r['tile_y']}.terrain"))
        n += 1
    return n


def write_tile_tree(tiles: DataFrame, out_dir: str, store_dir: str | None = None) -> int:
    """Local-mode convenience: write the cluster-safe store, then
    materialize the file tree next to it. out_dir must be reachable
    from the DRIVER (the store, by contrast, can be any shared FS)."""
    store = store_dir or os.path.join(out_dir, "_store")
    write_tile_store(tiles, store)
    return materialize_tile_tree(tiles.sparkSession, store, out_dir)


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
