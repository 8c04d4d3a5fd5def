"""Curvature meshing method (simple_meshing.cpp:16-34 interface;
selection rule documented in kernels/curvature.py — the Raster2Mesh
addon source is not in the reference tree)."""

from __future__ import annotations

import numpy as np

from tin_terrain_spark.kernels.curvature import (
    curvature_keep_mask,
    generate_tin_curvature,
)
from tin_terrain_spark.kernels.raster import Grid


def _terrain(n=48):
    x = np.linspace(0, 4, n)
    X, Y = np.meshgrid(x, x)
    return np.sin(X * 2) * np.cos(Y * 1.5) * 10 + X * 2


def test_flat_plane_keeps_only_corners():
    # a plane has zero curvature everywhere -> only the 4 anchors
    z = np.outer(np.arange(20.0), np.ones(20)) * 3 + 5
    keep = curvature_keep_mask(z, np.nan, 1e-6)
    assert keep.sum() == 4
    assert keep[0, 0] and keep[0, -1] and keep[-1, 0] and keep[-1, -1]


def test_threshold_monotone():
    z = _terrain()
    g = lambda: Grid(z.copy())
    v_lo, f_lo = generate_tin_curvature(g(), 0.05)
    v_hi, f_hi = generate_tin_curvature(g(), 0.5)
    assert len(v_lo) > len(v_hi) >= 4
    assert len(f_lo) > len(f_hi) >= 2


def test_mesh_is_delaunay_and_z_preserved():
    z = _terrain()
    grid = Grid(z.copy(), xpos=100.0, ypos=200.0, cellsize=5.0)
    verts, faces = generate_tin_curvature(grid, 0.2)
    assert faces.max() < len(verts)
    # every vertex carries its source sample's z
    cols = grid.x2col(verts[:, 0])
    rows = grid.y2row(verts[:, 1])
    np.testing.assert_array_equal(verts[:, 2], z[rows, cols])
    # CCW in the x-y plane (facade contract)
    v = verts[faces]
    ccw = (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1]) - (
        v[:, 1, 1] - v[:, 0, 1]
    ) * (v[:, 2, 0] - v[:, 0, 0])
    assert (ccw > 0).all()


def test_nodata_cells_never_selected():
    z = _terrain(30)
    z[5:12, 5:12] = -9999.0
    keep = curvature_keep_mask(z, -9999.0, 0.01)
    assert not keep[5:12, 5:12].any()
    verts, faces = generate_tin_curvature(Grid(z.copy(), ndv=-9999.0), 0.1)
    assert (verts[:, 2] != -9999.0).all()


def test_mesh_tiles_registry_accepts_curvature():
    from tin_terrain_spark.operators.geocode import geocode_points
    from tin_terrain_spark.operators.meshing import mesh_tiles
    from tin_terrain_spark.session import get_spark

    spark = get_spark("curv_test", cores=8)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pts = geocode_points(docs, zoom=1, grid_bits=5)
    rows = mesh_tiles(pts, zoom=1, grid_bits=5, method="curvature", max_error=0.5).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_vertices"] >= 3 and r["n_faces"] >= 1
