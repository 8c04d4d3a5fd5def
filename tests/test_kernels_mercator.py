"""Mercator projection goldens (reference MercatorProjection.h:27-31,
MercatorProjection.cpp:11-80, and the P4 ceil-1 tie rule)."""

import numpy as np

from tin_terrain_spark.kernels import mercator as M


def test_constants():
    assert M.R_EARTH == 6378137.0
    assert M.HALF_CIRCUMFERENCE == 20037508.342789243


def test_lonlat_meters_roundtrip():
    lon = np.array([-180.0, -90.0, 0.0, 45.0, 179.9])
    lat = np.array([-85.0, -45.0, 0.0, 45.0, 85.0])
    mx, my = M.lonlat_to_meters(lon, lat)
    lon2, lat2 = M.meters_to_lonlat(mx, my)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_origin_maps_to_zero():
    mx, my = M.lonlat_to_meters(0.0, 0.0)
    assert mx == 0.0
    assert abs(my) < 1e-9


def test_edge_of_world():
    mx, _ = M.lonlat_to_meters(180.0, 0.0)
    assert abs(mx - M.HALF_CIRCUMFERENCE) < 1e-6


def test_resolution_zoom0():
    # full world = 256 px at zoom 0
    assert abs(M.resolution(0) - 2 * M.HALF_CIRCUMFERENCE / 256) < 1e-9
    assert abs(M.resolution(10) - M.resolution(0) / 1024) < 1e-12


def test_tile_tie_rule_ceil_minus_one():
    """Pixel exactly on a tile's right edge belongs to the lower tile
    (MercatorProjection.cpp:48-56)."""
    tx, ty = M.pixels_to_tile(np.array([256.0]), np.array([256.0]))
    assert tx[0] == 0 and ty[0] == 0
    tx, ty = M.pixels_to_tile(np.array([256.0000001]), np.array([512.0]))
    assert tx[0] == 1 and ty[0] == 1
    tx, ty = M.pixels_to_tile(np.array([0.5]), np.array([255.999]))
    assert tx[0] == 0 and ty[0] == 0


def test_meters_to_tile_center_of_world():
    # meters (0,0) is the exact corner of 4 tiles at zoom 1 → tie rule
    # assigns the lower-left one (tile 0,0)
    tx, ty = M.meters_to_tile(0.0, 0.0, 1)
    assert int(tx) == 0 and int(ty) == 0
    tx, ty = M.meters_to_tile(1.0, 1.0, 1)
    assert int(tx) == 1 and int(ty) == 1


def test_tile_bounds_roundtrip():
    min_x, min_y, max_x, max_y = M.tile_bounds(3, 5, 4)
    assert abs((max_x - min_x) - M.tile_size_meters(4)) < 1e-6
    # a point inside those bounds maps back to the tile
    tx, ty = M.meters_to_tile((min_x + max_x) / 2, (min_y + max_y) / 2, 4)
    assert int(tx) == 3 and int(ty) == 5
    # the max corner itself belongs to this tile (ceil-1 rule)
    tx, ty = M.meters_to_tile(max_x, max_y, 4)
    assert int(tx) == 3 and int(ty) == 5
