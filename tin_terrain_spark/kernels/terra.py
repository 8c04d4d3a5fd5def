"""Terra greedy-insertion TIN refinement over a heightfield grid.

Re-implements the reference's TerraMesh kernel
(/root/reference/src/TerraMesh.cpp:16-242, facade
src/terra_meshing.cpp:8-37) on top of the quad-edge Delaunay structure:

  1. repair the 4 grid corners via nearest-valid-average, 0.0 fallback
     (src/TerraUtils.cpp:8-22)
  2. init a 2-triangle mesh on the corners (DelaunayMesh.cpp:16-50)
  3. scan every triangle: per-triangle argmax |z - plane z| over unused,
     valid cells, via the reference's exact scanline walk — including
     its restart-at-v0_x behavior for the lower sub-triangle
     (TerraMesh.cpp:150-166) — pushing one candidate per scan
  4. pop candidates by importance (lazy-deletion heap with token
     staleness, TerraUtils.h:42-65 + TerraMesh.cpp:66-67), insert into
     the Delaunay mesh; optimize() rescans affected triangles
  5. emit vertices in row-major used-cell order, faces in
     m_first_face link order with the reference's CCW flip
     (TerraMesh.cpp:175-242)

Mesh coordinates during refinement are (col, row) pixel coords; emitted
vertices are world coords via pixel-center mapping col2x/row2y.

Heap tie rule: the C++ priority_queue pops an unspecified element among
equal importances; we deterministically pop the lowest token first
(validated by invariants + counts, not exact vertex identity —
SURVEY.md §2.7 determinism note).
"""

from __future__ import annotations

import heapq

import numpy as np

from .delaunay import DelaunayMesh, Triangle
from .geometry import tri_area
from .raster import Grid, sample_nearest_valid_avg


def _scan_triangle_ranges(points, plane, src: np.ndarray, used: np.ndarray, ndv: float):
    """Vectorized scanline candidate search over one triangle.

    Replicates the reference's exact row coverage (TerraMesh.cpp:109-167):
    vertices y-sorted (stable), upper rows [v0y, v1y) walk edges
    (v0→v1, v0→v2), lower rows [v1y, v2y] walk (v1→v2) with the
    long-edge x restarting at v0x (the reference's quirk), per-row span
    [ceil(min(x1,x2)), floor(max(x1,x2))]. Edge x's accumulate via
    cumsum (sequential adds, like the C++ `x += dx`). Selection is
    first-strict-max of |z - plane| over unused valid cells in
    (row, col) scan order. Returns [x, y, z, importance]."""
    pts = [points[0], points[1], points[2]]
    if pts[0][1] > pts[1][1]:
        pts[0], pts[1] = pts[1], pts[0]
    if pts[1][1] > pts[2][1]:
        pts[1], pts[2] = pts[2], pts[1]
    if pts[0][1] > pts[1][1]:
        pts[0], pts[1] = pts[1], pts[0]
    (v0x, v0y), (v1x, v1y), (v2x, v2y) = pts

    a, b, c = plane
    dx2 = (v2x - v0x) / (v2y - v0y) if v2y != v0y else 0.0

    ys_parts, x1_parts, x2_parts = [], [], []
    if v1y != v0y:
        dx1 = (v1x - v0x) / (v1y - v0y)
        n = int(v1y) - int(v0y)
        steps1 = np.full(n, dx1)
        steps1[0] = v0x
        steps2 = np.full(n, dx2)
        steps2[0] = v0x
        ys_parts.append(np.arange(int(v0y), int(v1y)))
        x1_parts.append(np.cumsum(steps1))
        x2_parts.append(np.cumsum(steps2))
    if v2y != v1y:
        dx1 = (v2x - v1x) / (v2y - v1y)
        n = int(v2y) - int(v1y) + 1
        steps1 = np.full(n, dx1)
        steps1[0] = v1x
        steps2 = np.full(n, dx2)
        steps2[0] = v0x  # restart-at-v0x (TerraMesh.cpp:155-158)
        ys_parts.append(np.arange(int(v1y), int(v2y) + 1))
        x1_parts.append(np.cumsum(steps1))
        x2_parts.append(np.cumsum(steps2))

    best = [0, 0, 0.0, -np.inf]
    if not ys_parts:
        return best
    ys = np.concatenate(ys_parts)
    x1s = np.concatenate(x1_parts)
    x2s = np.concatenate(x2_parts)

    startx = np.ceil(np.minimum(x1s, x2s)).astype(np.int64)
    endx = np.floor(np.maximum(x1s, x2s)).astype(np.int64)
    lens = endx - startx + 1
    keep = lens > 0
    if not keep.any():
        return best
    ys, startx, lens = ys[keep], startx[keep], lens[keep]

    cum = np.cumsum(lens)
    total = int(cum[-1])
    flat_y = np.repeat(ys, lens)
    flat_x = np.arange(total) - np.repeat(cum - lens, lens) + np.repeat(startx, lens)

    zv = src[flat_y, flat_x]
    mask = (used[flat_y, flat_x] == 0) & ~(np.isnan(zv) | (zv == ndv))
    if not mask.any():
        return best
    diff = np.abs(zv - (a * flat_x + b * flat_y + c))
    diff = np.where(mask, diff, -np.inf)
    k = int(np.argmax(diff))  # first max == strict-> selection in scan order
    if diff[k] > best[3]:
        best[0] = int(flat_x[k])
        best[1] = int(flat_y[k])
        best[2] = float(zv[k])
        best[3] = float(diff[k])
    return best


class TerraMesh(DelaunayMesh):
    def __init__(self, grid: Grid):
        super().__init__()
        self.grid = grid
        h, w = grid.z.shape
        self.used = np.zeros((h, w), dtype=np.int8)
        self.token = np.zeros((h, w), dtype=np.int64)
        self.heap: list = []
        self.counter = 0
        self.max_error = 0.0

    # -- corner repair (TerraUtils.cpp:8-22) -----------------------------

    def repair_point(self, px: int, py: int) -> None:
        # no caching across calls: the reference repairs corners against
        # the LIVE raster, so each repair may see earlier repairs
        # (sample_nearest_valid_avg vectorizes the subsample plane per call)
        z = sample_nearest_valid_avg(self.grid, py, px)
        ndv = self.grid.ndv
        if np.isnan(z) or z == ndv:
            self.grid.z[py, px] = 0.0
        else:
            self.grid.z[py, px] = z

    # -- candidate scan (TerraMesh.cpp:78-173) ----------------------------

    def scan_triangle(self, t: Triangle) -> None:
        p1, p2, p3 = self.face_points(t)
        z = self.grid.z
        # plane through the three grid samples (TerraUtils.h:89-100)
        v = [(p[0], p[1], z[int(p[1]), int(p[0])]) for p in (p1, p2, p3)]
        ux, uy, uz = v[1][0] - v[0][0], v[1][1] - v[0][1], v[1][2] - v[0][2]
        vx, vy, vz = v[2][0] - v[0][0], v[2][1] - v[0][1], v[2][2] - v[0][2]
        den = ux * vy - uy * vx
        a = (uz * vy - uy * vz) / den
        b = (ux * vz - uz * vx) / den
        c = v[0][2] - a * v[0][0] - b * v[0][1]

        best = _scan_triangle_ranges(
            (p1, p2, p3), (a, b, c), z, self.used, self.grid.ndv
        )
        token = self.counter
        self.counter += 1
        # token write happens even when no candidate was found
        # (TerraMesh.cpp:168-172)
        self.token[best[1], best[0]] = token
        heapq.heappush(self.heap, (-best[3], token, best[0], best[1], best[2], t))

    # -- greedy loop (TerraMesh.cpp:16-76) --------------------------------

    def greedy_insert(self, max_error: float) -> None:
        self.max_error = max_error
        g = self.grid
        h, w = g.z.shape
        assert w >= 2 and h >= 2, "raster must be at least 2x2"

        self.repair_point(0, 0)
        self.repair_point(0, h - 1)
        self.repair_point(w - 1, h - 1)
        self.repair_point(w - 1, 0)

        self.init_mesh((0.0, 0.0), (0.0, float(h - 1)), (float(w - 1), float(h - 1)), (float(w - 1), 0.0))

        self.used[0, 0] = 1
        self.used[h - 1, 0] = 1
        self.used[h - 1, w - 1] = 1
        self.used[0, w - 1] = 1

        for t in list(self.faces()):
            self.scan_triangle(t)

        while self.heap:
            neg_imp, token, cx, cy, cz, tri = heapq.heappop(self.heap)
            importance = -neg_imp
            if importance < max_error:
                # heap property: everything left is smaller — drain
                # (equivalent to the reference's skip-continue loop,
                # TerraMesh.cpp:62-64)
                break
            if self.token[cy, cx] != token:
                continue  # stale candidate (TerraMesh.cpp:66-67)
            self.used[cy, cx] = 1
            self.insert((float(cx), float(cy)), tri)

    # -- emission (TerraMesh.cpp:175-242) ----------------------------------

    def to_mesh(self):
        """Returns (vertices (n,3) world coords, faces (m,3) int64)."""
        g = self.grid
        h, w = g.z.shape
        ndv = g.ndv

        ys, xs = np.nonzero(self.used == 1)
        order = np.argsort(ys * w + xs, kind="stable")  # row-major
        ys, xs = ys[order], xs[order]
        zs = g.z[ys, xs]
        keep = ~(np.isnan(zs) | (zs == ndv))
        ys, xs, zs = ys[keep], xs[keep], zs[keep]

        vertex_id = np.zeros((h, w), dtype=np.int64)
        vertex_id[ys, xs] = np.arange(len(xs))

        verts = np.column_stack([g.col2x(xs), g.row2y(ys), zs])

        faces = []
        for t in self.faces():
            p1, p2, p3 = self.face_points(t)
            i1 = vertex_id[int(p1[1]), int(p1[0])]
            i2 = vertex_id[int(p2[1]), int(p2[0])]
            i3 = vertex_id[int(p3[1]), int(p3[0])]
            # reference flips when ccw() holds in pixel space
            # (TerraMesh.cpp:220-231; pixel y grows downward, so this
            # yields upward-facing world-space triangles)
            if tri_area(p1[0], p1[1], p2[0], p2[1], p3[0], p3[1]) > 0:
                faces.append((i3, i2, i1))
            else:
                faces.append((i1, i2, i3))
        faces_arr = (
            np.asarray(faces, dtype=np.int64)
            if faces
            else np.zeros((0, 3), dtype=np.int64)
        )
        return verts, faces_arr


def generate_tin_terra(grid: Grid, max_error: float):
    """Facade mirroring generate_tin_terra (src/terra_meshing.cpp:8-37).

    Returns (vertices (n,3) float64 world coords, faces (m,3) int64)."""
    tm = TerraMesh(grid)
    tm.greedy_insert(max_error)
    return tm.to_mesh()
