"""Hex-grid geometry invariants (functions/hexgrid.py).

The cross-engine value parity of hex ids is covered by the hex_cells /
knn_hex oracle gate; these tests pin the geometry the kNN guarantee
depends on: cube-rounding validity, nearest-center property, and that
hex_ring_guarantee_m never overstates the safe radius."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tin_terrain_spark.functions.hexgrid import hex_ring_guarantee_m

SQRT3 = math.sqrt(3.0)


def axial_to_xy(q: int, r: int, s: float) -> tuple[float, float]:
    # pointy-top axial → cartesian (inverse of hex_frac_sql)
    return s * SQRT3 * (q + r / 2.0), s * 1.5 * r


def xy_to_axial(x: float, y: float, s: float) -> tuple[int, int]:
    # reference python mirror of the SQL template (fq/fr + cube round)
    fq = (SQRT3 / 3.0 * x - y / 3.0) / s
    fr = (2.0 / 3.0 * y) / s
    fs = -fq - fr
    rq, rr, rs = math.floor(fq + 0.5), math.floor(fr + 0.5), math.floor(fs + 0.5)
    dq, dr, ds = abs(rq - fq), abs(rr - fr), abs(rs - fs)
    if dq > dr and dq > ds:
        rq = -rr - rs
    elif dr > ds:
        rr = -rq - rs
    return rq, rr


def hex_dist(q1, r1, q2, r2) -> int:
    dq, dr = q1 - q2, r1 - r2
    return (abs(dq) + abs(dr) + abs(dq + dr)) // 2


def test_round_trip_centers():
    s = 1000.0
    for q in range(-5, 6):
        for r in range(-5, 6):
            x, y = axial_to_xy(q, r, s)
            assert xy_to_axial(x, y, s) == (q, r)


def test_nearest_center_assignment():
    """Every random point maps to the hex whose center is nearest
    (ties are measure-zero under random draws)."""
    s = 500.0
    rng = np.random.RandomState(11)
    centers = {
        (q, r): axial_to_xy(q, r, s) for q in range(-8, 9) for r in range(-8, 9)
    }
    for _ in range(300):
        x = float(rng.uniform(-3000, 3000))
        y = float(rng.uniform(-3000, 3000))
        got = xy_to_axial(x, y, s)
        best = min(centers, key=lambda k: (centers[k][0] - x) ** 2 + (centers[k][1] - y) ** 2)
        assert got == best


def test_ring_guarantee_is_safe():
    """No point of any hex OUTSIDE ring R may be closer to any point of
    the query hex than hex_ring_guarantee_m(R, s): check over sampled
    boundary points of both hexes for all rings up to 4."""
    s = 100.0
    corners = [
        (s * math.cos(a), s * math.sin(a))
        for a in [math.pi / 6 + i * math.pi / 3 for i in range(6)]
    ]
    for ring in range(1, 5):
        g = hex_ring_guarantee_m(ring, s)
        worst = float("inf")
        for q in range(-ring - 2, ring + 3):
            for r in range(-ring - 2, ring + 3):
                if hex_dist(q, r, 0, 0) <= ring:
                    continue
                cx, cy = axial_to_xy(q, r, s)
                for ox, oy in corners:
                    for px, py in corners:
                        d = math.hypot(cx + ox - px, cy + oy - py)
                        worst = min(worst, d)
        assert worst >= g - 1e-9, (ring, worst, g)


def test_guarantee_monotone_nonnegative():
    for s in (1.0, 157.0, 1e6):
        prev = -1.0
        for ring in range(0, 10):
            g = hex_ring_guarantee_m(ring, s)
            assert g >= 0.0 and g >= prev
            prev = g


@pytest.mark.parametrize("ring", [1, 2, 3])
def test_ring_cell_count(ring):
    """|{cells with hex_dist <= R}| == 3R(R+1)+1 — the bounded fan-out
    the kNN join relies on."""
    n = sum(
        1
        for q in range(-ring, ring + 1)
        for r in range(-ring, ring + 1)
        if hex_dist(q, r, 0, 0) <= ring
    )
    assert n == 3 * ring * (ring + 1) + 1
