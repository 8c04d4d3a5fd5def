"""Unconstrained Delaunay triangulation of arbitrary 2.5D point sets
(M6 — the reference's Points2Mesh/Delaunator path,
/root/reference/src/Points2Mesh.cpp:78-85, src/Delaunator.cpp).

The reference uses a sweep-hull Delaunator port (addon path, off by
default). Here the same operator is built on our quad-edge incremental
structure (kernels/delaunay.py): a bounding super-quad hosts the
insertions, and faces touching super-quad corners are dropped on
emission — standard public technique; outputs are valid Delaunay
triangulations of the inputs (verified by the in-circle property test),
not bit-copies of Delaunator's.
"""

from __future__ import annotations

import numpy as np

from .delaunay import DelaunayMesh
from .geometry import tri_area


def generate_delaunay_mesh(points: np.ndarray, backend: str = "incremental"):
    """points: (n, 3) float64 (x, y, z); duplicate (x, y) keep the first
    z. Returns (verts (m,3), faces (k,3) int64, CCW upward).

    backend='incremental' (default): quad-edge insertion in a super-quad
    — the engine's native structure. backend='sweephull': the
    reference's actual Delaunator algorithm (kernels/delaunator.py).
    Both produce THE Delaunay triangulation (unique for points in
    general position); test_points2mesh asserts face-set equality."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) < 3:
        return pts.reshape(-1, 3), np.zeros((0, 3), dtype=np.int64)
    if backend == "sweephull":
        return _generate_sweephull(pts)
    if backend != "incremental":
        raise ValueError(f"unknown Delaunay backend {backend!r}")

    # dedup on (x, y), first-seen
    _, first_idx = np.unique(pts[:, :2], axis=0, return_index=True)
    keep = np.sort(first_idx)
    pts = pts[keep]

    min_x, min_y = pts[:, 0].min(), pts[:, 1].min()
    max_x, max_y = pts[:, 0].max(), pts[:, 1].max()
    pad = max(max_x - min_x, max_y - min_y, 1.0) * 10.0
    a = (min_x - pad, min_y - pad)
    b = (min_x - pad, max_y + pad)
    c = (max_x + pad, max_y + pad)
    d = (max_x + pad, min_y - pad)

    dm = DelaunayMesh()
    dm.init_mesh(a, b, c, d)
    zmap = {}
    for x, y, z in pts:
        p = (float(x), float(y))
        zmap[p] = float(z)
        dm.insert(p)

    vid = {}
    verts = []
    faces = []
    super_pts = {a, b, c, d}
    for t in dm.faces():
        p1, p2, p3 = dm.face_points(t)
        if p1 in super_pts or p2 in super_pts or p3 in super_pts:
            continue
        idx = []
        for p in (p1, p2, p3):
            if p not in vid:
                vid[p] = len(verts)
                verts.append((p[0], p[1], zmap[p]))
            idx.append(vid[p])
        # enforce CCW (x-y plane, y-up world coords)
        v = [verts[i] for i in idx]
        if tri_area(v[0][0], v[0][1], v[1][0], v[1][1], v[2][0], v[2][1]) < 0:
            idx[0], idx[1] = idx[1], idx[0]
        faces.append(tuple(idx))

    return (
        np.asarray(verts, dtype=np.float64).reshape(-1, 3),
        np.asarray(faces, dtype=np.int64).reshape(-1, 3),
    )


def _generate_sweephull(pts: np.ndarray):
    """Delaunator backend with the same output contract as the
    incremental path: first-seen (x, y) dedup, CCW-upward faces."""
    from .delaunator import generate_delaunay_faces_sweephull

    _, first_idx = np.unique(pts[:, :2], axis=0, return_index=True)
    pts = pts[np.sort(first_idx)]
    faces = generate_delaunay_faces_sweephull(pts[:, :2])
    if faces is None:
        return pts.reshape(-1, 3), np.zeros((0, 3), dtype=np.int64)
    # normalize to CCW in the x-y plane (the facade contract; Delaunator
    # emits a consistent orientation but with the opposite convention)
    v = pts[faces]
    cw = (
        (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
        - (v[:, 1, 1] - v[:, 0, 1]) * (v[:, 2, 0] - v[:, 0, 0])
    ) < 0
    faces[cw] = faces[cw][:, [1, 0, 2]]
    return pts, faces
