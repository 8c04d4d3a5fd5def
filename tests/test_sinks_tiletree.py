"""Cluster-safe tile sink: parquet store (DataFrame writer, one job)
+ driver-side file-tree materialization, roundtrip-checked against the
quantized-mesh decoder."""

from __future__ import annotations

import os

import pytest

from tin_terrain_spark.operators.geocode import geocode_points
from tin_terrain_spark.operators.meshing import mesh_tiles
from tin_terrain_spark.operators.sinks import (
    materialize_tile_tree,
    write_tile_store,
    write_tile_tree,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from tin_terrain_spark.session import get_spark

    yield get_spark("sink_test", cores=8)


@pytest.fixture(scope="module")
def tiles(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pts = geocode_points(docs, zoom=1, grid_bits=5)
    return mesh_tiles(pts, zoom=1, grid_bits=5, method="terra", max_error=2.0)


def test_store_then_materialize(spark, tiles, tmp_path):
    store = str(tmp_path / "store")
    out = str(tmp_path / "tree")
    write_tile_store(tiles, store)
    # partition-pruned layout on disk
    assert any(p.startswith("zoom=") for p in os.listdir(store))
    n = materialize_tile_tree(spark, store, out)
    assert n == 4  # zoom 1 over the full extent

    rows = {
        (r["zoom"], r["tile_x"], r["tile_y"]): r
        for r in tiles.select("zoom", "tile_x", "tile_y", "n_faces").collect()
    }
    from tin_terrain_spark.kernels.codec import decode_qm_tile

    found = 0
    for (z, x, y), r in rows.items():
        p = os.path.join(out, str(z), str(x), f"{y}.terrain")
        assert os.path.exists(p), p
        t = decode_qm_tile(open(p, "rb").read())
        assert len(t.faces) == r["n_faces"]
        found += 1
    assert found == 4

    # idempotent overwrite through the facade
    n2 = write_tile_tree(tiles, out, store_dir=store)
    assert n2 == 4
