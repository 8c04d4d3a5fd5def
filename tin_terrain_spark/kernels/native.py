"""Compile-on-first-use native fast path for the mesh kernels.

`_native/tinmesh.c` is a direct C translation of this repo's own
Python kernels (delaunay.py / terra.py / zemlya.py) with bit-identical
float semantics (-ffp-contract=off, same expression order, same
MT19937(42) walk, same (-importance, token) heap order). This module
builds it with the system C compiler into a per-user cache directory
the first time it's needed and exposes drop-in replacements for the
greedy-insertion cores.

Gating: everything degrades to the pure-Python kernels —
  - no C compiler / failed compile / failed load  → Python
  - TTS_NO_NATIVE=1 in the environment            → Python
  - capacity overflow inside the C kernel         → Python (per call)
The Python path remains the semantics oracle: tests assert the two
backends produce byte-identical vertices/faces on every workload
class, and the frozen goldens pin both.

Cluster story: --py-files ships the .c source as package data; each
executor compiles once per node into its local cache (atomic rename —
concurrent tasks race benignly). Nodes without a toolchain silently
run the Python path; results are identical either way.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native", "tinmesh.c")

_CFLAGS = ["-O2", "-fPIC", "-shared", "-ffp-contract=off", "-fno-unsafe-math-optimizations"]

_lib = None
_tried = False


def _read_source() -> bytes | None:
    """Read tinmesh.c — from the filesystem when the package is a plain
    directory, via pkgutil when it's imported from a --py-files zip
    (executors on a real cluster load the package from a zip archive;
    open() on a path inside a zip raises OSError)."""
    try:
        with open(_SRC, "rb") as f:
            return f.read()
    except OSError:
        pass
    try:
        import pkgutil

        return pkgutil.get_data("tin_terrain_spark.kernels", "_native/tinmesh.c")
    except Exception:
        return None


def _build_and_load():
    """Compile (cached by source hash) and load the shared library.
    Returns a ctypes CDLL or None."""
    if os.environ.get("TTS_NO_NATIVE"):
        return None
    src_bytes = _read_source()
    if src_bytes is None:
        return None
    tag = hashlib.md5(src_bytes).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), f"tts_native_{os.getuid()}")
    so_path = os.path.join(cache_dir, f"tinmesh_{tag}.so")
    if not os.path.exists(so_path):
        try:
            os.makedirs(cache_dir, exist_ok=True)
            # materialize the source beside the cache so the compiler can
            # read it even when the package lives inside a zip
            src_path = os.path.join(cache_dir, f"tinmesh_{tag}.c")
            if not os.path.exists(src_path):
                stmp = src_path + f".tmp{os.getpid()}"
                with open(stmp, "wb") as f:
                    f.write(src_bytes)
                os.replace(stmp, src_path)
            for cc in ("cc", "gcc", "clang"):
                tmp = so_path + f".tmp{os.getpid()}"
                try:
                    r = subprocess.run(
                        [cc, *_CFLAGS, "-o", tmp, src_path, "-lm"],
                        capture_output=True, timeout=120,
                    )
                except (OSError, subprocess.TimeoutExpired):
                    continue
                if r.returncode == 0:
                    os.replace(tmp, so_path)  # atomic: concurrent builds race benignly
                    break
                if os.path.exists(tmp):
                    os.unlink(tmp)
            else:
                return None
        except OSError:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    i64 = ctypes.c_int64
    dbl = ctypes.c_double
    P = ctypes.POINTER
    lib.tin_terra_greedy.restype = i64
    lib.tin_terra_greedy.argtypes = [
        P(dbl), ctypes.c_int, ctypes.c_int, dbl, dbl,
        P(ctypes.c_uint8), P(i64),
        P(ctypes.c_int32), i64, P(dbl), i64, P(i64),
    ]
    lib.tin_zemlya_greedy.restype = i64
    lib.tin_zemlya_greedy.argtypes = [
        P(dbl), P(dbl), ctypes.c_int, ctypes.c_int, ctypes.c_int, dbl, dbl,
        P(dbl), P(ctypes.c_uint8), P(i64),
        P(ctypes.c_int32), i64, P(dbl), i64, P(i64),
    ]
    lib.tin_repair_corners.restype = None
    lib.tin_repair_corners.argtypes = [P(dbl), ctypes.c_int, ctypes.c_int, dbl]
    lib.tin_clip01.restype = i64
    lib.tin_clip01.argtypes = [P(dbl), i64, P(dbl), i64]
    return lib


def get_lib():
    global _lib, _tried
    if not _tried:
        _tried = True
        _lib = _build_and_load()
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def _emit(zsrc: np.ndarray, used_valid: np.ndarray,
          faces_pts: np.ndarray, pts: np.ndarray, grid):
    """Shared emission: mirrors TerraMesh.to_mesh / ZemlyaMesh.to_mesh
    (row-major vertex order, CCW flip in pixel space), vectorized."""
    h, w = zsrc.shape
    ys, xs = np.nonzero(used_valid)
    order = np.argsort(ys * w + xs, kind="stable")
    ys, xs = ys[order], xs[order]
    zs = zsrc[ys, xs]

    vertex_id = np.zeros((h, w), dtype=np.int64)
    vertex_id[ys, xs] = np.arange(len(xs))
    verts = np.column_stack([grid.col2x(xs), grid.row2y(ys), zs])

    if len(faces_pts) == 0:
        return verts, np.zeros((0, 3), dtype=np.int64)
    p1 = pts[faces_pts[:, 0]]
    p2 = pts[faces_pts[:, 1]]
    p3 = pts[faces_pts[:, 2]]
    i1 = vertex_id[p1[:, 1].astype(np.int64), p1[:, 0].astype(np.int64)]
    i2 = vertex_id[p2[:, 1].astype(np.int64), p2[:, 0].astype(np.int64)]
    i3 = vertex_id[p3[:, 1].astype(np.int64), p3[:, 0].astype(np.int64)]
    area = (p2[:, 0] - p1[:, 0]) * (p3[:, 1] - p1[:, 1]) - (
        p2[:, 1] - p1[:, 1]
    ) * (p3[:, 0] - p1[:, 0])
    flip = area > 0
    faces = np.where(
        flip[:, None],
        np.column_stack([i3, i2, i1]),
        np.column_stack([i1, i2, i3]),
    ).astype(np.int64)
    return verts, faces


def _repair_corners(grid) -> None:
    """TerraUtils corner repair against the LIVE raster — identical to
    TerraMesh.repair_point call order. The 3x3-subsample plane is
    computed once and reused across corners, but ONLY while provably
    unchanged: a corner write that alters the raster invalidates it, so
    the values equal the per-call-fresh-plane semantics bit-for-bit
    (a prior repaired corner can land inside a later corner's Bresenham
    search on near-empty rasters)."""
    from .raster import _subsample_3x3_full, sample_nearest_valid_avg

    h, w = grid.z.shape
    plane = None
    for px, py in ((0, 0), (0, h - 1), (w - 1, h - 1), (w - 1, 0)):
        if plane is None:
            plane = _subsample_3x3_full(grid.z, grid.ndv)
        z = sample_nearest_valid_avg(grid, py, px, subsampled=plane)
        old = grid.z[py, px]
        new = 0.0 if (np.isnan(z) or z == grid.ndv) else z
        grid.z[py, px] = new
        # bit-level change check (NaN old and ±0.0 flips both count)
        if not (new == old and np.signbit(new) == np.signbit(old)):
            plane = None


def repair_corners_dispatch(grid) -> None:
    """Corner repair via the C path when available (lazy per-center
    subsample against the live raster — value-identical to the Python
    plane, asserted in tests/test_native_parity.py), else the Python
    plane implementation."""
    lib = get_lib()
    h, w = grid.z.shape
    if lib is not None and grid.z.dtype == np.float64 and grid.z.flags.c_contiguous:
        lib.tin_repair_corners(
            _ptr(grid.z, ctypes.c_double), h, w, float(grid.ndv)
        )
        return
    _repair_corners(grid)


def clip01_native(triangles: np.ndarray):
    """C fast path for clip_triangles_to_01_quadrant: same sequential
    algorithm, same output ORDER (strictly-inside first, then clip
    survivors). Returns the clipped (m, 3, 3) array or None when the
    native library is unavailable / capacity overflowed."""
    lib = get_lib()
    if lib is None:
        return None
    tris = np.ascontiguousarray(triangles, dtype=np.float64)
    n = len(tris)
    cap = 16 * n + 8
    out = np.empty((cap, 3, 3), dtype=np.float64)
    m = lib.tin_clip01(
        _ptr(tris, ctypes.c_double), n, _ptr(out, ctypes.c_double), cap
    )
    if m < 0:
        return None
    return out[:m]


def _snapshot_corners(grid):
    """Bit-exact copies of the 4 corner cells, taken BEFORE
    _repair_corners: corner repair is not idempotent (a repaired corner
    can enter a later corner's nearest-valid search), so a native-path
    failure after repair must hand the pure-Python fallback pristine
    corners or the fallback diverges from the semantics oracle."""
    h, w = grid.z.shape
    return [(py, px, grid.z[py, px].copy())
            for px, py in ((0, 0), (0, h - 1), (w - 1, h - 1), (w - 1, 0))]


def _restore_corners(grid, snap) -> None:
    for py, px, v in snap:
        grid.z[py, px] = v


def terra_native(grid, max_error: float):
    """Native TerraMesh greedy_insert + to_mesh. Returns (verts, faces)
    or None when the native path is unavailable / overflowed."""
    lib = get_lib()
    if lib is None:
        return None
    h, w = grid.z.shape
    if h < 2 or w < 2:
        return None
    corner_snap = _snapshot_corners(grid)
    repair_corners_dispatch(grid)
    z = np.ascontiguousarray(grid.z, dtype=np.float64)
    used = np.zeros((h, w), dtype=np.uint8)
    token = np.zeros((h, w), dtype=np.int64)
    cap_pts = h * w + 8
    cap_faces = 2 * cap_pts + 16
    faces_pts = np.empty((cap_faces, 3), dtype=np.int32)
    pts = np.empty((cap_pts, 2), dtype=np.float64)
    n_pts = ctypes.c_int64(0)
    nf = lib.tin_terra_greedy(
        _ptr(z, ctypes.c_double), h, w, float(grid.ndv), float(max_error),
        _ptr(used, ctypes.c_uint8), _ptr(token, ctypes.c_int64),
        _ptr(faces_pts, ctypes.c_int32), cap_faces,
        _ptr(pts, ctypes.c_double), cap_pts, ctypes.byref(n_pts),
    )
    if nf < 0:
        _restore_corners(grid, corner_snap)  # pure-Python fallback must
        return None  # repair pristine corners (repair isn't idempotent)
    # grid.z may have been repaired in place; emission reads it like
    # TerraMesh.to_mesh (used cells, nan/ndv dropped)
    zs = grid.z
    valid = (used == 1) & ~(np.isnan(zs) | (zs == grid.ndv))
    return _emit(zs, valid, faces_pts[:nf], pts[: n_pts.value], grid)


def zemlya_native(grid, max_error: float):
    """Native ZemlyaMesh greedy_insert + to_mesh. Returns (verts,
    faces) or None. Pyramid + per-level insert rasters are precomputed
    in NumPy (they depend only on the raster, not the mesh)."""
    lib = get_lib()
    if lib is None:
        return None
    from .zemlya import ZemlyaMesh

    h, w = grid.z.shape
    if h < 2 or w < 2:
        return None
    zm = ZemlyaMesh(grid)
    zm.build_pyramid()  # pre-repair raster, as in greedy_insert
    corner_snap = _snapshot_corners(grid)
    repair_corners_dispatch(grid)

    result = np.full((h, w), np.nan)
    z = grid.z
    result[0, 0] = z[0, 0]
    result[h - 1, 0] = z[h - 1, 0]
    result[h - 1, w - 1] = z[h - 1, w - 1]
    result[0, w - 1] = z[0, w - 1]

    max_level = zm.max_level
    stack = np.empty((max_level, h, w), dtype=np.float64)
    for level in range(1, max_level + 1):
        zm._update_insert(level)
        stack[level - 1] = zm.insert_r

    zc = np.ascontiguousarray(z, dtype=np.float64)
    used = np.zeros((h, w), dtype=np.uint8)
    token = np.zeros((h, w), dtype=np.int64)
    cap_pts = h * w * max_level + 8
    cap_faces = 2 * cap_pts + 16
    faces_pts = np.empty((cap_faces, 3), dtype=np.int32)
    pts = np.empty((cap_pts, 2), dtype=np.float64)
    n_pts = ctypes.c_int64(0)
    nf = lib.tin_zemlya_greedy(
        _ptr(zc, ctypes.c_double), _ptr(stack, ctypes.c_double),
        max_level, h, w, float(grid.ndv), float(max_error),
        _ptr(result, ctypes.c_double),
        _ptr(used, ctypes.c_uint8), _ptr(token, ctypes.c_int64),
        _ptr(faces_pts, ctypes.c_int32), cap_faces,
        _ptr(pts, ctypes.c_double), cap_pts, ctypes.byref(n_pts),
    )
    if nf < 0:
        _restore_corners(grid, corner_snap)  # see terra_native
        return None
    valid = ~(np.isnan(result) | (result == grid.ndv))
    return _emit(result, valid, faces_pts[:nf], pts[: n_pts.value], grid)
