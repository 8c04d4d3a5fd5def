"""Sweep-hull Delaunay triangulation (the reference's Delaunator port,
/root/reference/src/Delaunator.cpp — itself the public mapbox
delaunator algorithm): the M6 addon backend behind Points2Mesh
(src/Points2Mesh.cpp:9-37, off by default in the CLI, src/cmd.cpp).

Same observable semantics as the C++:
  - seed triangle: point closest to the bbox centroid, then its nearest
    neighbour, then the minimal-circumradius third (Delaunator.cpp:165-213)
  - points processed by distance from the seed circumcenter with
    (dist, x, y) tie-breaks (compare, Delaunator.cpp:85-105)
  - hull as a doubly-linked list + pseudo-angle hash table, including
    the C++ port's `(m_hash_size - 1)` key quirk (Delaunator.cpp:458-477)
  - legalize: strict in-circle (< 0) edge flips; the recursion is
    replaced by the standard explicit stack (same flip order: re-check
    the flipped edge first, then the deferred br edges LIFO)
  - triangles emitted as an index triple list in creation order

Collinear/degenerate inputs return None (the C++ returns false).
"""

from __future__ import annotations

import numpy as np

_MAXD = float("inf")


def _circumradius(ax, ay, bx, by, cx, cy) -> float:
    dx = bx - ax
    dy = by - ay
    ex = cx - ax
    ey = cy - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    d = dx * ey - dy * ex
    if d == 0:
        return _MAXD
    x = (ey * bl - dy * cl) * 0.5 / d
    y = (dx * cl - ex * bl) * 0.5 / d
    if bl and cl and (x or y):
        return x * x + y * y
    return _MAXD


def _circumcenter(ax, ay, bx, by, cx, cy):
    dx = bx - ax
    dy = by - ay
    ex = cx - ax
    ey = cy - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    d = dx * ey - dy * ex
    return (
        ax + (ey * bl - dy * cl) * 0.5 / d,
        ay + (dx * cl - ex * bl) * 0.5 / d,
    )


def _area(px, py, qx, qy, rx, ry) -> float:
    """Delaunator.cpp:53-61 orientation (positive = clockwise in the
    usual math convention; the algorithm only uses its sign)."""
    return (qy - py) * (rx - qx) - (qx - px) * (ry - qy)


def _in_circle(ax, ay, bx, by, cx, cy, px, py) -> bool:
    dx = ax - px
    dy = ay - py
    ex = bx - px
    ey = by - py
    fx = cx - px
    fy = cy - py
    ap = dx * dx + dy * dy
    bp = ex * ex + ey * ey
    cp = fx * fx + fy * fy
    return (
        dx * (ey * cp - bp * fy) - dy * (ex * cp - bp * fx) + ap * (ex * fy - ey * fx)
    ) < 0


class Delaunator:
    """Array-encoded sweep-hull triangulator. triangulate() fills
    `triangles` (flat index triples) and `halfedges`."""

    def __init__(self) -> None:
        self.triangles: list[int] = []
        self.halfedges: list[int] = []

    def triangulate(self, coords) -> bool:
        xs = np.asarray(coords, dtype=np.float64)[0::2]
        ys = np.asarray(coords, dtype=np.float64)[1::2]
        n = len(xs)
        self.triangles = []
        self.halfedges = []
        if n < 3:
            return False

        cx = (xs.min() + xs.max()) / 2
        cy = (ys.min() + ys.max()) / 2

        # seed: closest to centroid (first index wins ties, like the
        # strict `<` in the C++ loops)
        d0 = (xs - cx) ** 2 + (ys - cy) ** 2
        i0 = int(np.argmin(d0))
        d1 = (xs - xs[i0]) ** 2 + (ys - ys[i0]) ** 2
        d1[i0] = _MAXD
        d1[d1 == 0.0] = _MAXD  # `d > 0` guard (Delaunator.cpp:186)
        i1 = int(np.argmin(d1))
        if d1[i1] == _MAXD:
            return False

        min_radius = _MAXD
        i2 = 0
        for i in range(n):
            if i == i0 or i == i1:
                continue
            r = _circumradius(xs[i0], ys[i0], xs[i1], ys[i1], xs[i], ys[i])
            if r < min_radius:
                i2 = i
                min_radius = r
        if min_radius == _MAXD:
            return False

        if _area(xs[i0], ys[i0], xs[i1], ys[i1], xs[i2], ys[i2]) < 0:
            i1, i2 = i2, i1

        i0x, i0y = float(xs[i0]), float(ys[i0])
        i1x, i1y = float(xs[i1]), float(ys[i1])
        i2x, i2y = float(xs[i2]), float(ys[i2])
        ccx, ccy = _circumcenter(i0x, i0y, i1x, i1y, i2x, i2y)
        self._cx, self._cy = ccx, ccy

        # sort by (dist-to-circumcenter, x, y) — compare(), :85-105
        dd = (xs - ccx) ** 2 + (ys - ccy) ** 2
        ids = sorted(range(n), key=lambda i: (dd[i], xs[i], ys[i]))

        self._hash_size = hs = int(np.ceil(np.sqrt(n)))
        self._hash = [-1] * hs

        # hull: parallel arrays (DelaunatorPoint)
        self._hi: list[int] = []
        self._hx: list[float] = []
        self._hy: list[float] = []
        self._ht: list[int] = []
        self._hprev: list[int] = []
        self._hnext: list[int] = []
        self._hrem: list[bool] = []

        xs_l = xs.tolist()
        ys_l = ys.tolist()

        e = self._insert_node(i0, xs_l, ys_l)
        self._hash_edge(e)
        self._ht[e] = 0
        e = self._insert_node_after(i1, e, xs_l, ys_l)
        self._hash_edge(e)
        self._ht[e] = 1
        e = self._insert_node_after(i2, e, xs_l, ys_l)
        self._hash_edge(e)
        self._ht[e] = 2

        self._add_triangle(i0, i1, i2, -1, -1, -1)

        hull_prev = self._hprev
        hull_next = self._hnext
        hull_x = self._hx
        hull_y = self._hy
        hull_i = self._hi
        hull_t = self._ht
        hull_rem = self._hrem
        halfedges = self.halfedges

        xp = yp = float("nan")
        for k in range(n):
            i = ids[k]
            x = xs_l[i]
            y = ys_l[i]
            if x == xp and y == yp:
                continue  # duplicate (adjacent in sort order)
            xp, yp = x, y
            if (x == i0x and y == i0y) or (x == i1x and y == i1y) or (x == i2x and y == i2y):
                continue

            start_key = self._hash_key(x, y)
            key = start_key
            start = -1
            while True:
                start = self._hash[key]
                key = (key + 1) % hs
                if not (start < 0 or hull_rem[start]) or key == start_key:
                    break

            e = start
            while _area(x, y, hull_x[e], hull_y[e],
                        hull_x[hull_next[e]], hull_y[hull_next[e]]) >= 0:
                e = hull_next[e]
                if e == start:
                    return False

            walk_back = e == start

            t = self._add_triangle(hull_i[e], i, hull_i[hull_next[e]], -1, -1, hull_t[e])
            hull_t[e] = t
            e = self._insert_node_after(i, e, xs_l, ys_l)

            hull_t[e] = self._legalize(t + 2, xs_l, ys_l)
            if hull_t[hull_prev[hull_prev[e]]] == halfedges[t + 1]:
                hull_t[hull_prev[hull_prev[e]]] = t + 2

            q = hull_next[e]
            while _area(x, y, hull_x[q], hull_y[q],
                        hull_x[hull_next[q]], hull_y[hull_next[q]]) < 0:
                t = self._add_triangle(
                    hull_i[q], i, hull_i[hull_next[q]],
                    hull_t[hull_prev[q]], -1, hull_t[q],
                )
                hull_t[hull_prev[q]] = self._legalize(t + 2, xs_l, ys_l)
                self._remove_node(q)
                q = hull_next[q]

            if walk_back:
                q = hull_prev[e]
                while _area(x, y, hull_x[hull_prev[q]], hull_y[hull_prev[q]],
                            hull_x[q], hull_y[q]) < 0:
                    t = self._add_triangle(
                        hull_i[hull_prev[q]], i, hull_i[q],
                        -1, hull_t[q], hull_t[hull_prev[q]],
                    )
                    self._legalize(t + 2, xs_l, ys_l)
                    hull_t[hull_prev[q]] = t
                    self._remove_node(q)
                    q = hull_prev[q]

            self._hash_edge(e)
            self._hash_edge(hull_prev[e])
        return True

    # -- hull nodes ------------------------------------------------------

    def _insert_node(self, i: int, xs, ys) -> int:
        node = len(self._hi)
        self._hi.append(i)
        self._hx.append(xs[i])
        self._hy.append(ys[i])
        self._ht.append(0)
        self._hprev.append(node)
        self._hnext.append(node)
        self._hrem.append(False)
        return node

    def _insert_node_after(self, i: int, prev: int, xs, ys) -> int:
        node = self._insert_node(i, xs, ys)
        self._hnext[node] = self._hnext[prev]
        self._hprev[node] = prev
        self._hprev[self._hnext[node]] = node
        self._hnext[prev] = node
        return node

    def _remove_node(self, node: int) -> int:
        self._hnext[self._hprev[node]] = self._hnext[node]
        self._hprev[self._hnext[node]] = self._hprev[node]
        self._hrem[node] = True
        return self._hprev[node]

    # -- pseudo-angle hash -------------------------------------------------

    def _hash_key(self, x: float, y: float) -> int:
        dx = x - self._cx
        dy = y - self._cy
        den = abs(dx) + abs(dy)
        p = 1 - dx / den if den != 0 else 0.0
        nom = 2 + (-p if dy < 0 else p)
        # the C++ port's (hash_size - 1) quirk, Delaunator.cpp:470-473
        return int(np.floor((self._hash_size - 1) * (nom / 4.0)))

    def _hash_edge(self, e: int) -> None:
        self._hash[self._hash_key(self._hx[e], self._hy[e])] = e

    # -- triangle store -----------------------------------------------------

    def _link(self, a: int, b: int) -> None:
        he = self.halfedges
        if a == len(he):
            he.append(b)
        else:
            he[a] = b
        if b != -1:
            if b == len(he):
                he.append(a)
            else:
                he[b] = a

    def _add_triangle(self, i0, i1, i2, a, b, c) -> int:
        t = len(self.triangles)
        self.triangles.extend((i0, i1, i2))
        self._link(t, a)
        self._link(t + 1, b)
        self._link(t + 2, c)
        return t

    def _legalize(self, a: int, xs, ys) -> int:
        """Iterative form of Delaunator.cpp:389-427: re-check the
        flipped edge first, deferred `br` edges LIFO — the same flip
        sequence as the C++ recursion."""
        tri = self.triangles
        he = self.halfedges
        stack: list[int] = []
        ar = 0
        while True:
            b = he[a]
            a0 = a - a % 3
            ar = a0 + (a + 2) % 3
            if b == -1:
                # convex-hull edge: nothing to flip. The C++ port has no
                # guard here and falls into C's negative-modulo garbage
                # indexing (Delaunator.cpp:392-404 with b = -1) — the
                # upstream mapbox algorithm's guard is the intended
                # behavior, so we fix rather than emulate the UB.
                if not stack:
                    break
                a = stack.pop()
                continue
            b0 = b - b % 3
            al = a0 + (a + 1) % 3
            bl = b0 + (b + 2) % 3
            p0 = tri[ar]
            pr = tri[a]
            pl = tri[al]
            p1 = tri[bl]
            if _in_circle(xs[p0], ys[p0], xs[pr], ys[pr], xs[pl], ys[pl], xs[p1], ys[p1]):
                tri[a] = p1
                tri[b] = p0
                self._link(a, he[bl])
                self._link(b, he[ar])
                self._link(ar, bl)
                stack.append(b0 + (b + 1) % 3)
                # loop re-checks `a` (the C++'s inner legalize(a) call)
            else:
                if not stack:
                    break
                a = stack.pop()
        return ar


def generate_delaunay_faces_sweephull(points_xy: np.ndarray):
    """Points2Mesh.cpp:9-37: (n,2) coords → (m,3) int64 face indices
    into the INPUT order, or None when no triangulation exists."""
    dn = Delaunator()
    coords = np.asarray(points_xy, dtype=np.float64).reshape(-1, 2).ravel()
    if not dn.triangulate(coords):
        return None
    return np.asarray(dn.triangles, dtype=np.int64).reshape(-1, 3)
