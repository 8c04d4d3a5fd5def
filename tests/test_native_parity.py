"""Native-vs-Python kernel parity (kernels/native.py + _native/tinmesh.c).

The C fast path must be BIT-IDENTICAL to the pure-Python kernels —
same vertices (including z doubles), same faces, same order — on every
workload class: hash-noise web tiles, smooth DEMs, no-data holes,
non-NaN ndv sentinels, flat ties, sparse rasters, and degenerate tiny
grids. The Python kernel is the semantics oracle (it carries the
reference citations + golden/invariant tests); the C kernel is a cache.
"""

from __future__ import annotations

import numpy as np
import pytest

from tin_terrain_spark.kernels import native
from tin_terrain_spark.kernels.raster import Grid
from tin_terrain_spark.kernels.terra import generate_tin_terra
from tin_terrain_spark.kernels.zemlya import generate_tin_zemlya

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C compiler in this environment"
)


def _grids():
    rng = np.random.RandomState(7)
    m = 52
    xx = np.linspace(0, 1, m)
    XX, YY = np.meshgrid(xx, xx)
    noise = np.sin(XX * 9) * np.cos(YY * 7) * 30 + rng.rand(m, m) * 8
    yield "noise", Grid(noise.copy()), np.nan

    n = 96
    x = np.linspace(0, 6, n)
    X, Y = np.meshgrid(x, x)
    smooth = np.sin(X) * np.cos(Y * 0.7) * 400 + X * 30
    yield "smooth", Grid(smooth.copy()), np.nan

    holes = noise.copy()
    holes[10:20, 15:30] = np.nan
    holes[0, :] = np.nan  # invalid corners force repair paths
    yield "nan_holes", Grid(holes.copy()), np.nan

    ndv = noise.copy()
    ndv[5:9, 5:9] = -9999.0
    yield "ndv_sentinel", Grid(ndv.copy(), ndv=-9999.0), -9999.0

    flat = np.full((33, 47), 5.0)
    flat[16, 23] = 50.0
    yield "flat_ties", Grid(flat.copy()), np.nan

    sparse = np.full((36, 36), np.nan)
    rr = np.random.RandomState(11)
    idx = rr.choice(36 * 36, 60, replace=False)
    sparse.ravel()[idx] = rr.rand(60) * 100
    yield "sparse_web", Grid(sparse.copy()), np.nan

    yield "tiny", Grid(np.array([[1.0, 2.0], [3.0, 4.0]])), np.nan


@pytest.mark.parametrize("kernel", ["terra", "zemlya"])
def test_backend_equality(kernel):
    gen = generate_tin_terra if kernel == "terra" else generate_tin_zemlya
    for name, grid, _ in _grids():
        gp = Grid(grid.z.copy(), grid.xpos, grid.ypos, grid.cellsize, grid.ndv)
        gn = Grid(grid.z.copy(), grid.xpos, grid.ypos, grid.cellsize, grid.ndv)
        vp, fp = gen(gp, 2.0, use_native=False)
        vn, fn = gen(gn, 2.0, use_native=True)
        assert np.array_equal(vp, vn), (kernel, name, "vertices differ")
        assert np.array_equal(fp, fn), (kernel, name, "faces differ")
        # corner repair must mutate the raster identically too
        assert np.array_equal(gp.z, gn.z, equal_nan=True), (kernel, name)


def test_native_disable_env(monkeypatch):
    """TTS_NO_NATIVE forces the Python path (and a fresh probe)."""
    monkeypatch.setenv("TTS_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)
    assert native.native_available() is False
    monkeypatch.setattr(native, "_tried", False)


def test_repair_corners_c_equals_python():
    """The lazy per-center C corner repair must mutate the raster
    bit-identically to the Python full-plane implementation on every
    grid class (sparse rasters stress the wide Bresenham search)."""
    for name, grid, ndv in _grids():
        gp = Grid(grid.z.copy(), grid.xpos, grid.ypos, grid.cellsize, grid.ndv)
        gn = Grid(grid.z.copy(), grid.xpos, grid.ypos, grid.cellsize, grid.ndv)
        native._repair_corners(gp)
        lib = native.get_lib()
        import ctypes

        h, w = gn.z.shape
        lib.tin_repair_corners(
            native._ptr(gn.z, ctypes.c_double), h, w, float(gn.ndv)
        )
        assert np.array_equal(gp.z, gn.z, equal_nan=True), name
        # repaired corners must also be bit-sign-identical
        for r, c in ((0, 0), (h - 1, 0), (h - 1, w - 1), (0, w - 1)):
            assert np.signbit(gp.z[r, c]) == np.signbit(gn.z[r, c]), name


def _clip_soups():
    from tin_terrain_spark.kernels.dense import generate_tin_dense_quadwalk
    from tin_terrain_spark.kernels.terra import generate_tin_terra

    rng = np.random.RandomState(5)
    # random soups straddling the unit square at several scales
    for scale, shift in ((1.4, -0.2), (3.0, -1.0), (0.5, 0.3)):
        yield f"random_{scale}", rng.rand(80, 3, 3) * scale + shift
    # a real mesh in buffered-tile unit space (vertices exactly on the
    # 0/1 lines and outside: the production shape)
    z = np.cumsum(rng.rand(36, 36) - 0.5, axis=0) * 5
    verts, faces = generate_tin_terra(Grid(z.copy()), 1.0)
    tris = verts[faces]
    unit = tris.copy()
    unit[:, :, 0] = unit[:, :, 0] / 31.0 - 0.0645
    unit[:, :, 1] = unit[:, :, 1] / 31.0 - 0.0645
    yield "mesh_buffered", unit
    # exact on-line vertices (x or y exactly 0/1) hit the sign==0 rules
    t = np.array(
        [
            [[0.0, 0.5, 1.0], [0.5, 0.5, 2.0], [0.5, 0.0, 3.0]],
            [[1.0, 1.0, 1.0], [0.2, 0.8, 2.0], [1.0, 0.2, 3.0]],
            [[-0.5, 0.5, 1.0], [1.5, 0.5, 2.0], [0.5, 1.5, 3.0]],  # split-quad
            [[2.0, 2.0, 0.0], [3.0, 2.0, 0.0], [2.0, 3.0, 0.0]],   # fully out
            [[np.nan, 0.5, 1.0], [0.5, 0.5, 2.0], [0.5, 0.0, 3.0]],  # nan tri
        ]
    )
    yield "edge_rules", t
    yield "empty", np.zeros((0, 3, 3))


def test_clip01_c_equals_python():
    from tin_terrain_spark.kernels.geometry import clip_triangles_to_01_quadrant

    for name, soup in _clip_soups():
        py = clip_triangles_to_01_quadrant(soup.copy(), force_python=True)
        cc = native.clip01_native(soup.copy())
        assert cc is not None, name
        assert py.shape == cc.shape, (name, py.shape, cc.shape)
        assert py.tobytes() == cc.tobytes(), name  # byte parity incl. -0.0


def test_max_error_sweep_equality():
    """Insertion order is error-threshold dependent; sweep thresholds."""
    rng = np.random.RandomState(3)
    z = rng.rand(40, 40) * 50
    for me in (0.5, 2.0, 10.0, 1e9):
        vp, fp = generate_tin_terra(Grid(z.copy()), me, use_native=False)
        vn, fn = generate_tin_terra(Grid(z.copy()), me, use_native=True)
        assert np.array_equal(vp, vn) and np.array_equal(fp, fn), me
