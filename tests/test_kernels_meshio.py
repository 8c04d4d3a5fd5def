"""Mesh I/O format tests (OBJ/OFF/ASC/XYZ round-trips, S3-S10) and the
2.5D clip kernels (F7-F10)."""

import numpy as np

from tin_terrain_spark.kernels import meshio as MIO
from tin_terrain_spark.kernels.geometry import (
    clip_triangles_to_01_quadrant,
    intersect_25d_segment_line,
    sign_2d,
)
from tin_terrain_spark.kernels.raster import Grid

VERTS = np.array([[0.0, 0.0, 1.5], [10.0, 0.0, 2.5], [10.0, 10.0, 3.5], [0.0, 10.0, 4.5]])
FACES = np.array([[0, 1, 2], [0, 2, 3]])


def test_obj_roundtrip():
    text = MIO.format_obj(VERTS, FACES)
    assert text.startswith("v 0.000000000000000000 0.000000000000000000 1.500000000000000000\n")
    assert "f 1 2 3\n" in text  # 1-based (MeshIO.cpp:241)
    v, f = MIO.parse_obj(text)
    np.testing.assert_array_equal(v, VERTS)
    np.testing.assert_array_equal(f, FACES)


def test_off_roundtrip_and_edge_count():
    text = MIO.format_off(VERTS, FACES)
    lines = text.splitlines()
    assert lines[0] == "OFF"
    # 4 verts, 2 faces, 5 distinct canonical edges (quad + diagonal)
    assert lines[1] == "4 2 5"
    v, f = MIO.parse_off(text)
    np.testing.assert_array_equal(v, VERTS)
    np.testing.assert_array_equal(f, FACES)


def test_geojson_structure():
    import json

    gj = json.loads(MIO.format_geojson(VERTS, FACES))
    assert gj["type"] == "FeatureCollection"
    kinds = [f["geometry"]["type"] for f in gj["features"]]
    assert kinds.count("Point") == 4
    assert kinds.count("LineString") == 2
    # triangle rings are closed
    ring = gj["features"][-1]["geometry"]["coordinates"]
    assert ring[0] == ring[-1]


def test_asc_roundtrip():
    g = Grid(np.arange(6, dtype=np.float64).reshape(2, 3), xpos=1.0, ypos=2.0, cellsize=0.5, ndv=-99999.0)
    text = MIO.format_asc(g)
    assert text.startswith("NCOLS 3\nNROWS 2\nXLLCORNER 1.000000000\n")
    g2 = MIO.parse_asc(text)
    np.testing.assert_array_equal(g2.z, g.z)
    assert g2.cellsize == 0.5


def test_xyz_parse_z_filter():
    text = "1 2 3\n4 5 99999\n7 8 -42\nbad line\n"
    pts = MIO.parse_xyz(text)
    # z=99999 dropped (SurfacePoints.cpp:43-46)
    assert pts.shape == (2, 3)
    assert pts[1][2] == -42


def test_sign_2d_axis_aligned_exact():
    """Exact comparisons for axis-aligned clip lines (geometrix.cpp:462-517)."""
    # bottom edge, right-wards: points above are inside (-1)
    assert sign_2d(0.5, 0.5, (0, 0), (1, 0)) == -1
    assert sign_2d(0.5, -0.5, (0, 0), (1, 0)) == 1
    assert sign_2d(0.5, 0.0, (0, 0), (1, 0)) == 0
    # left edge, downwards: points right of x=0 are inside
    assert sign_2d(0.5, 0.5, (0, 1), (0, -1)) == -1
    assert sign_2d(-0.5, 0.5, (0, 1), (0, -1)) == 1
    assert sign_2d(0.0, 0.5, (0, 1), (0, -1)) == 0


def test_intersect_z_interpolation():
    p = intersect_25d_segment_line((0, 0, 0), (2, 0, 4), (1, -1), (0, 1))
    assert abs(p[0] - 1.0) < 1e-12
    assert abs(p[2] - 2.0) < 1e-12
    # parallel → NaN
    p2 = intersect_25d_segment_line((0, 0, 0), (2, 0, 4), (0, 1), (1, 0))
    assert np.isnan(p2[0])


def test_clip_inside_untouched():
    tris = np.array([[[0.2, 0.2, 1.0], [0.8, 0.2, 2.0], [0.5, 0.8, 3.0]]])
    out = clip_triangles_to_01_quadrant(tris)
    np.testing.assert_array_equal(out, tris)


def test_clip_outside_removed():
    tris = np.array([[[2.0, 2.0, 1.0], [3.0, 2.0, 2.0], [2.5, 3.0, 3.0]]])
    out = clip_triangles_to_01_quadrant(tris)
    assert len(out) == 0


def test_clip_straddling_splits():
    """Triangle crossing the right edge: clipped area = intersection
    with the unit square; may split into 2 triangles (shorter diagonal,
    geometrix.cpp:700-737)."""
    tris = np.array([[[0.5, 0.2, 1.0], [1.5, 0.2, 1.0], [0.5, 0.8, 1.0]]])
    out = clip_triangles_to_01_quadrant(tris)
    assert len(out) >= 1
    assert (out[:, :, 0] <= 1.0 + 1e-12).all()
    # area preserved: original ∩ square
    def area(t):
        return 0.5 * abs(
            (t[1][0] - t[0][0]) * (t[2][1] - t[0][1])
            - (t[1][1] - t[0][1]) * (t[2][0] - t[0][0])
        )

    total = sum(area(t) for t in out)
    # exact intersection area of this triangle with x<=1:
    # original area 0.3; outside part is the sub-triangle beyond x=1
    # with width 0.5 of the 1.0-wide triangle → similar triangle area
    # = 0.3 * (0.5/1.0)^2 * ... compute numerically instead:
    xs = np.linspace(0, 1, 2001)
    # numeric check via rasterization of the clipped region
    from tin_terrain_spark.kernels.geometry import barycentric_interpolate

    yy, xx = np.meshgrid(np.linspace(0, 1, 801), np.linspace(0, 1, 801), indexing="ij")
    _, inside = barycentric_interpolate(tris[0][0], tris[0][1], tris[0][2], xx, yy)
    expected = inside.mean()  # fraction of unit square
    assert abs(total - expected) < 5e-3


def test_qm_32bit_index_path():
    """>65536 vertices switches to 32-bit indices (QuantizedMeshIO.cpp:482-497)."""
    from tin_terrain_spark.kernels.codec import decode_qm_tile, encode_qm_tile

    n = 260  # grid of (n+1)^2 > 65536 vertices
    xs = np.linspace(0, 1, n + 1)
    vv, uu = np.meshgrid(xs, xs, indexing="ij")
    zz = (uu + vv) / 2
    # build quads → 2 triangles each
    tris = []
    for r in range(0, n, 1):
        for c in range(0, n, 1):
            tris.append(
                [
                    (uu[r, c], vv[r, c], zz[r, c]),
                    (uu[r + 1, c], vv[r + 1, c], zz[r + 1, c]),
                    (uu[r, c + 1], vv[r, c + 1], zz[r, c + 1]),
                ]
            )
    tris = np.asarray(tris[: 70000 // 1])  # enough unique verts > 65536
    blob = encode_qm_tile(tris, (0, 0, 0), (1, 1, 1), mesh_is_rescaled=True)
    t = decode_qm_tile(blob)
    assert len(t.u) > 65536
    assert len(t.faces) == len(tris)
    assert (t.faces < len(t.u)).all()


def test_points2mesh_delaunay_property():
    """M6: unconstrained Delaunay over random points — every triangle's
    circumcircle is empty of other points (the Delaunay property, up to
    the kernel's EPS bias) and the triangulation covers the hull."""
    from tin_terrain_spark.kernels.geometry import in_circle
    from tin_terrain_spark.kernels.points2mesh import generate_delaunay_mesh

    rng = np.random.RandomState(42)
    pts = np.column_stack([rng.rand(60) * 100, rng.rand(60) * 100, rng.rand(60)])
    verts, faces = generate_delaunay_mesh(pts)
    assert len(verts) == 60
    assert len(faces) >= 60  # ~2n triangles for interior-dominated sets
    # Delaunay property (with the reference's 1e-6 in-circle bias)
    for f in faces[:: max(1, len(faces) // 40)]:
        av, bv, cv = verts[f[0]], verts[f[1]], verts[f[2]]
        for k, p in enumerate(verts):
            if k in f:
                continue
            assert not in_circle(
                av[0], av[1], bv[0], bv[1], cv[0], cv[1], p[0], p[1]
            ), (f, k)
    # area = convex hull area (no holes/overlaps)
    area2 = 0.0
    for f in faces:
        av, bv, cv = verts[f[0]], verts[f[1]], verts[f[2]]
        area2 += abs(
            (bv[0] - av[0]) * (cv[1] - av[1]) - (bv[1] - av[1]) * (cv[0] - av[0])
        )
    def hull_area(p):
        from functools import cmp_to_key
        pts2 = sorted(map(tuple, p[:, :2]))
        def half(pts2):
            out = []
            for q in pts2:
                while len(out) >= 2 and (out[-1][0]-out[-2][0])*(q[1]-out[-2][1])-(out[-1][1]-out[-2][1])*(q[0]-out[-2][0]) <= 0:
                    out.pop()
                out.append(q)
            return out
        lo = half(pts2); hi = half(pts2[::-1])
        hull = lo[:-1] + hi[:-1]
        a = 0.0
        for i in range(len(hull)):
            x1, y1 = hull[i]; x2, y2 = hull[(i+1) % len(hull)]
            a += x1*y2 - x2*y1
        return abs(a)
    assert abs(area2 / 2.0 - hull_area(verts) / 2.0) < 1e-6 * hull_area(verts)


def test_points2mesh_duplicates_and_small():
    from tin_terrain_spark.kernels.points2mesh import generate_delaunay_mesh

    v, f = generate_delaunay_mesh(np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 2.0]]))
    assert len(f) == 0
    v, f = generate_delaunay_mesh(
        np.array([[0, 0, 1], [1, 0, 2], [0, 1, 3], [0, 0, 9]], dtype=float)
    )
    assert len(v) == 3  # duplicate (0,0) dropped, first z kept
    z_at_origin = {(p[0], p[1]): p[2] for p in v}[(0.0, 0.0)]
    assert z_at_origin == 1.0
    assert len(f) == 1
