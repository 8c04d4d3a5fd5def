"""Icosahedral H3 projection layer: geo -> (face, CoordIJK) and back.

This supplies the step the planar shim in h3pack.py documents as
missing: projecting a lat/lng onto the H3 icosahedron — closest-face
selection, gnomonic projection into the face plane, rotation into the
face's Class II hex axes, aperture-7 scaling to a resolution, and
nearest-hex-center rounding to integer CoordIJK. The inverse (cell
ijk -> center lat/lng) is also provided, which is what makes the
layer testable without any external library: a point's assigned cell
center must re-project to the same cell, and cube rounding must pick
the closest center in the face plane (both property-tested in
tests/test_h3geo.py).

Constants and their provenance (public spec / pure math):
- the 20 face-center lat/lngs and the per-face Class II i-axis
  azimuths are the published orientation constants of the public H3
  core library (faceijk.c: faceCenterGeo, faceAxesAzRadsCII[.][0]).
  tests/test_h3geo.py validates that the table IS a geometrically
  exact icosahedron (every face has exactly 3 neighbors at the
  dodecahedral center angle acos(sqrt(5)/3), antipodal closure, unit
  vectors) to 1e-9 — i.e. the table is internally consistent, not a
  garbled copy.
- RES0_U_GNOMONIC = (3 - sqrt(5))/2 = 1/phi^2 (the res-0 unit scale),
  M_AP7_ROT_RADS = asin(sqrt(3/28)) (the Class III aperture-7
  rotation), and sqrt(7) are DERIVED here, not transcribed.

HONESTY CAVEAT (also in NOTES.md): this sandbox has no h3 library and
no network, so the table's GLOBAL ORIENTATION cannot be pinned against
real-library output from inside the sandbox; and base-cell NUMBERING
(the 122-entry faceIjkBaseCells/baseCellData tables, pure published
constants) is not reproducible from first principles — it is an
arbitrary canonical ordering. Until those tables arrive as retrieved
public content, set_base_cell_tables() below is the injection point:
once called, geo_to_h3() emits fully library-laid-out ids through
h3pack's spec-true digit machinery with zero further code.

Reference parity note: the reference engine has no spherical index at
all (its tiler is Web-Mercator only, src/dem2tintiles_workflow.cpp);
this module exists for the charter's "H3/S2 cells" surface.
"""

from __future__ import annotations

import math

import numpy as np

# --- derived scalars --------------------------------------------------

SQRT7 = math.sqrt(7.0)
# res-0 hexagon scale in gnomonic units: 1/phi^2 (golden ratio)
RES0_U_GNOMONIC = (3.0 - math.sqrt(5.0)) / 2.0
# Class III aperture-7 rotation: asin(sqrt(3/28))
AP7_ROT_RADS = math.asin(math.sqrt(3.0 / 28.0))
_SQRT3_2 = math.sqrt(3.0) / 2.0
_EPS = 1e-11

# --- published orientation constants (public H3 core library) ---------

# (lat, lng) radians of the 20 icosahedron face centers
FACE_CENTER_GEO = np.array([
    (0.803582649718989942, 1.248397419617396099),    # face  0
    (1.307747883455638156, 2.536945009877921159),    # face  1
    (1.054751253523952054, -1.347517358900396623),   # face  2
    (0.600191595538186799, -0.450603909469755746),   # face  3
    (0.491715428198773866, 0.401988202911306943),    # face  4
    (0.172745327415618701, 1.678146885280433686),    # face  5
    (0.605929321571350690, 2.953923329812411617),    # face  6
    (0.427370518328979641, -1.888876200336285401),   # face  7
    (-0.079066118549212831, -0.733429513380867741),  # face  8
    (-0.230961644455383637, 0.506495587332349035),   # face  9
    (0.079066118549212831, 2.408163140208925497),    # face 10
    (0.230961644455383637, -2.635097066257444203),   # face 11
    (-0.172745327415618701, -1.463445768309359553),  # face 12
    (-0.605929321571350690, -0.187669323777381622),  # face 13
    (-0.427370518328979641, 1.252716453253507838),   # face 14
    (-0.600191595538186799, 2.690988744120037492),   # face 15
    (-0.491715428198773866, -2.739604450678486295),  # face 16
    (-0.803582649718989942, -1.893195233972397139),  # face 17
    (-1.307747883455638156, -0.604647643711872080),  # face 18
    (-1.054751253523952054, 1.794075294689396615),   # face 19
], dtype=np.float64)

# azimuth (radians, from north, clockwise) from each face center to
# the face's Class II i-axis (faceAxesAzRadsCII[face][0]; the j/k axes
# sit at -120 and -240 degrees from it and are never needed here)
FACE_AXES_AZ_I = np.array([
    5.619958268523939882,   # face  0
    5.760339081714187279,   # face  1
    0.780213654393430055,   # face  2
    0.430469363979999913,   # face  3
    6.130269123335111400,   # face  4
    2.692877706530642877,   # face  5
    2.982963003477243874,   # face  6
    3.532912002790141181,   # face  7
    3.494305004259568154,   # face  8
    3.003214169499538391,   # face  9
    5.930472956509811562,   # face 10
    0.138378484090254847,   # face 11
    0.448714947059150361,   # face 12
    0.158629650112549365,   # face 13
    5.891865957979238535,   # face 14
    2.711123289609793325,   # face 15
    3.294508837434268316,   # face 16
    3.804819692245439833,   # face 17
    3.664438879055192436,   # face 18
    2.361378999196363184,   # face 19
], dtype=np.float64)


def _geo_to_xyz(lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    """(..., ) radians -> unit vectors (..., 3)."""
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)], axis=-1)


FACE_CENTER_XYZ = _geo_to_xyz(FACE_CENTER_GEO[:, 0], FACE_CENTER_GEO[:, 1])


def geo_to_face(lat: np.ndarray, lng: np.ndarray):
    """Closest icosahedron face per point (max dot product). Returns
    (face int array, sqd float array) — sqd is the squared 3D chord
    distance to the face center, as the spec's projection consumes."""
    v = _geo_to_xyz(np.asarray(lat, float), np.asarray(lng, float))
    dots = v @ FACE_CENTER_XYZ.T  # (..., 20)
    face = np.argmax(dots, axis=-1)
    best = np.take_along_axis(dots, face[..., None], axis=-1)[..., 0]
    sqd = np.maximum(2.0 - 2.0 * best, 0.0)  # |v-c|^2 = 2 - 2 v.c
    return face.astype(np.int64), sqd


def _geo_azimuth(lat1, lng1, lat2, lng2):
    """Great-circle initial bearing 1 -> 2, radians (north=0, cw)."""
    dl = lng2 - lng1
    return np.arctan2(
        np.cos(lat2) * np.sin(dl),
        np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dl),
    )


def _geo_az_distance(lat1, lng1, az, dist):
    """Destination point at angular distance `dist` along bearing `az`
    from (lat1, lng1); all radians."""
    sd, cd = np.sin(dist), np.cos(dist)
    sl, cl = np.sin(lat1), np.cos(lat1)
    lat2 = np.arcsin(np.clip(sl * cd + cl * sd * np.cos(az), -1.0, 1.0))
    lng2 = lng1 + np.arctan2(np.sin(az) * sd * cl, cd - sl * np.sin(lat2))
    # normalize to (-pi, pi]
    return lat2, np.arctan2(np.sin(lng2), np.cos(lng2))


def geo_to_hex2d(lat, lng, res: int):
    """Project points into their closest face's hex2d plane at `res`:
    gnomonic radial scaling (tan of the angular distance over the
    res-0 unit), azimuth rotated into the face's Class II i-axis frame
    (minus the aperture-7 rotation on Class III resolutions).
    Returns (face, x, y)."""
    lat = np.asarray(lat, float)
    lng = np.asarray(lng, float)
    face, sqd = geo_to_face(lat, lng)
    r = np.arccos(np.clip(1.0 - sqd / 2.0, -1.0, 1.0))  # angular dist
    clat = FACE_CENTER_GEO[face, 0]
    clng = FACE_CENTER_GEO[face, 1]
    theta = FACE_AXES_AZ_I[face] - _geo_azimuth(clat, clng, lat, lng)
    if res % 2 == 1:  # Class III
        theta = theta - AP7_ROT_RADS
    scale = (SQRT7 ** res) / RES0_U_GNOMONIC
    r2d = np.tan(r) * scale
    r2d = np.where(r < _EPS, 0.0, r2d)
    return face, r2d * np.cos(theta), r2d * np.sin(theta)


def hex2d_to_ijk(x, y):
    """Nearest hex center in the unit pointy-axes frame used by the
    face plane (i-axis along +x): fractional axial coords from the
    cartesian pair, then cube rounding (round each cube coordinate,
    re-fix the one with the largest rounding error so i+j+k stays 0 —
    this IS nearest-center assignment, property-tested). Returns
    normalized non-negative (i, j, k) per h3pack._normalize."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    dj = y / _SQRT3_2
    di = x + dj / 2.0
    # In the (di, dj) frame the 6 unit-distance neighbors of the
    # origin are (+-1,0), (0,+-1), (1,1), (-1,-1) — i.e. (di, -dj) is
    # a STANDARD axial pair (up to a reflection, which preserves
    # distance), so standard cube rounding on (q, r, -q-r) =
    # (di, -dj, dj-di) is exact nearest-center assignment here
    # (property-tested against the 5x5 lattice neighborhood).
    a, b = di, -dj
    c = -a - b
    ra, rb, rc = np.round(a), np.round(b), np.round(c)
    da, db, dc = np.abs(ra - a), np.abs(rb - b), np.abs(rc - c)
    fix_a = (da >= db) & (da >= dc)
    fix_b = ~fix_a & (db >= dc)
    ra = np.where(fix_a, -(rb + rc), ra)
    rb = np.where(fix_b, -(ra + rc), rb)
    i = ra.astype(np.int64)
    j = (-rb).astype(np.int64)
    k = np.zeros_like(i)
    # normalize to the library's non-negative ijk form
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


def ijk_to_hex2d(i, j, k):
    """Cell center in the face plane (inverse of hex2d_to_ijk on
    lattice points)."""
    di = np.asarray(i, float) - np.asarray(k, float)
    dj = np.asarray(j, float) - np.asarray(k, float)
    return di - dj / 2.0, dj * _SQRT3_2


def geo_to_face_ijk(lat, lng, res: int):
    """lat/lng (radians) -> (face, i, j, k) at `res`: the icosahedral
    front-end's output, ready for base-cell resolution (and already
    consumable by h3pack.h3_from_axial under a per-face origin)."""
    face, x, y = geo_to_hex2d(lat, lng, res)
    i, j, k = hex2d_to_ijk(x, y)
    return face, i, j, k


def face_ijk_to_geo(face, i, j, k, res: int):
    """Cell-center lat/lng (radians) of (face, ijk) at `res` — the
    inverse projection (hex2d -> angular distance via arctan of the
    rescaled radius -> destination along the un-rotated azimuth)."""
    face = np.asarray(face, np.int64)
    x, y = ijk_to_hex2d(i, j, k)
    r2d = np.hypot(x, y)
    theta = np.arctan2(y, x)
    if res % 2 == 1:  # undo Class III rotation
        theta = theta + AP7_ROT_RADS
    scale = (SQRT7 ** res) / RES0_U_GNOMONIC
    r = np.arctan(r2d / scale)
    clat = FACE_CENTER_GEO[face, 0]
    clng = FACE_CENTER_GEO[face, 1]
    az = FACE_AXES_AZ_I[face] - theta
    lat2, lng2 = _geo_az_distance(clat, clng, az, r)
    origin = r2d < _EPS
    return np.where(origin, clat, lat2), np.where(origin, clng, lng2)


# --- Spark surface ----------------------------------------------------


def with_face_ijk(df, res: int, lat_col: str = "lat", lng_col: str = "lng",
                  degrees: bool = True):
    """Add (h3_face, h3_i, h3_j, h3_k) columns: the icosahedral cell
    coordinate at `res`. Vectorized Arrow batches (mapInPandas — one
    NumPy pass per batch, no per-row Python); the closest-face argmax
    and the trig chain are whole-array ops over the 20-row constant
    tables, so per-row cost is a handful of FLOPs. At 10^12 rows this
    is a map-only stage: no shuffle, no state, partition-parallel."""
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("h3_face", T.IntegerType()),
            T.StructField("h3_i", T.LongType()),
            T.StructField("h3_j", T.LongType()),
            T.StructField("h3_k", T.LongType()),
        ]
    )
    to_rad = math.pi / 180.0 if degrees else 1.0

    def run(batches):
        for pdf in batches:
            lat = pdf[lat_col].to_numpy(dtype=float) * to_rad
            lng = pdf[lng_col].to_numpy(dtype=float) * to_rad
            f, i, j, k = geo_to_face_ijk(lat, lng, res)
            out = pdf.copy()
            out["h3_face"] = f.astype(np.int32)
            out["h3_i"] = i
            out["h3_j"] = j
            out["h3_k"] = k
            yield out

    return df.mapInPandas(run, schema)


EARTH_R_MERC = 20037508.342789243 / math.pi  # Web-Mercator sphere radius


def with_face_ijk_from_mercator(df, res: int, x_col: str = "x",
                                y_col: str = "y"):
    """Same as with_face_ijk but from Web-Mercator meters (the
    engine's native point frame): inverse-Mercator to lat/lng inside
    the SAME NumPy pass (lat = 2 atan(exp(y/R)) - pi/2), so the whole
    transcendental chain runs in one Arrow batch kernel."""
    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("h3_face", T.IntegerType()),
            T.StructField("h3_i", T.LongType()),
            T.StructField("h3_j", T.LongType()),
            T.StructField("h3_k", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            x = pdf[x_col].to_numpy(dtype=float)
            y = pdf[y_col].to_numpy(dtype=float)
            lat = 2.0 * np.arctan(np.exp(y / EARTH_R_MERC)) - math.pi / 2.0
            lng = x / EARTH_R_MERC
            f, i, j, k = geo_to_face_ijk(lat, lng, res)
            out = pdf.copy()
            out["h3_face"] = f.astype(np.int32)
            out["h3_i"] = i
            out["h3_j"] = j
            out["h3_k"] = k
            yield out

    return df.mapInPandas(run, schema)


def with_face_ijk_cols(df, res: int, x_col: str = "x", y_col: str = "y"):
    """Pure-Column twin of with_face_ijk_from_mercator: the whole
    icosahedral chain — inverse Mercator, 20-way closest-face argmax
    (array_max over a struct array; ties break to the lowest face via
    the negated-face field, matching NumPy argmax), gnomonic scaling,
    Class II/III rotation, nearest-center cube rounding — as JVM
    Column algebra inside WholeStageCodegen. No UDF, no Python worker,
    no Arrow hop: at 10^12 rows this is the plan you want (the
    mapInPandas form above is the tested NumPy reference twin).

    Staged through intermediate columns on purpose: each stage's
    outputs are referenced several times downstream, and Catalyst's
    CollapseProject keeps multi-referenced non-trivial aliases as
    separate projections — inlining everything into one expression
    would re-embed the 20-struct array once per reference and blow the
    tree up exponentially (measured: the single-projection form never
    finished analysis)."""
    from pyspark.sql import functions as F

    lat = 2.0 * F.atan(F.exp(F.col(y_col) / F.lit(EARTH_R_MERC))) - math.pi / 2.0
    lng = F.col(x_col) / F.lit(EARTH_R_MERC)
    out = (
        df.withColumn("_lng", lng)
        .withColumn("_slat", F.sin(lat))
        .withColumn("_clat", F.cos(lat))
    )

    entries = []
    for f in range(20):
        fc_lat = float(FACE_CENTER_GEO[f, 0])
        fc_lng = float(FACE_CENTER_GEO[f, 1])
        dot = F.col("_slat") * math.sin(fc_lat) + F.col("_clat") * math.cos(
            fc_lat
        ) * F.cos(F.col("_lng") - F.lit(fc_lng))
        entries.append(
            F.struct(
                dot.alias("dot"),
                F.lit(-f).alias("negface"),
                F.lit(fc_lat).alias("clat"),
                F.lit(fc_lng).alias("clng"),
                F.lit(float(FACE_AXES_AZ_I[f])).alias("az0"),
            )
        )
    out = out.withColumn("_best", F.array_max(F.array(*entries)))

    r = F.acos(
        F.least(F.lit(1.0), F.greatest(F.lit(-1.0), F.col("_best.dot")))
    )
    az = F.atan2(
        F.col("_clat") * F.sin(F.col("_lng") - F.col("_best.clng")),
        F.cos(F.col("_best.clat")) * F.col("_slat")
        - F.sin(F.col("_best.clat")) * F.col("_clat")
        * F.cos(F.col("_lng") - F.col("_best.clng")),
    )
    theta = F.col("_best.az0") - az
    if res % 2 == 1:
        theta = theta - AP7_ROT_RADS
    scale = (SQRT7 ** res) / RES0_U_GNOMONIC
    out = (
        out.withColumn("_r", r)
        .withColumn("_theta", theta)
        .withColumn(
            "_r2d",
            F.when(F.col("_r") < _EPS, F.lit(0.0)).otherwise(
                F.tan(F.col("_r")) * scale
            ),
        )
        .withColumn("_hx", F.col("_r2d") * F.cos(F.col("_theta")))
        .withColumn("_hy", F.col("_r2d") * F.sin(F.col("_theta")))
    )

    dj = F.col("_hy") / _SQRT3_2
    out = (
        out.withColumn("_a", F.col("_hx") + dj / 2.0)
        .withColumn("_b", -dj)
        .withColumn("_c", -F.col("_a") - F.col("_b"))
        .withColumn("_ra", F.round(F.col("_a")))
        .withColumn("_rb", F.round(F.col("_b")))
        .withColumn("_rc", F.round(F.col("_c")))
    )
    da = F.abs(F.col("_ra") - F.col("_a"))
    db = F.abs(F.col("_rb") - F.col("_b"))
    dc = F.abs(F.col("_rc") - F.col("_c"))
    fix_a = (da >= db) & (da >= dc)
    fa = F.when(fix_a, -(F.col("_rb") + F.col("_rc"))).otherwise(F.col("_ra"))
    fb = F.when(~fix_a & (db >= dc), -(F.col("_ra") + F.col("_rc"))).otherwise(
        F.col("_rb")
    )
    out = (
        out.withColumn("_i0", fa.cast("bigint"))
        .withColumn("_j0", (-fb).cast("bigint"))
    )
    m = F.least(F.col("_i0"), F.col("_j0"), F.lit(0).cast("bigint"))
    out = (
        out.withColumn("h3_face", (-F.col("_best.negface")).cast("int"))
        .withColumn("_m", m)
        .withColumn("h3_i", F.col("_i0") - F.col("_m"))
        .withColumn("h3_j", F.col("_j0") - F.col("_m"))
        .withColumn("h3_k", -F.col("_m"))
    )
    return out.drop(
        "_lng", "_slat", "_clat", "_best", "_r", "_theta", "_r2d", "_hx",
        "_hy", "_a", "_b", "_c", "_ra", "_rb", "_rc", "_i0", "_j0", "_m"
    )


def face_table_sql() -> str:
    """The 20-face constant table as a SQL VALUES relation (17-digit
    round-trip literals — both engines parse them to identical
    doubles): (face, clat, clng, az0)."""
    rows = ", ".join(
        f"({f}, {FACE_CENTER_GEO[f, 0]!r}, {FACE_CENTER_GEO[f, 1]!r}, "
        f"{FACE_AXES_AZ_I[f]!r})"
        for f in range(20)
    )
    return f"(VALUES {rows}) AS f(face, clat, clng, az0)"


# --- base-cell injection point ---------------------------------------

_BASE_CELL_TABLES = None


def set_base_cell_tables(face_ijk_base_cells, base_cell_data) -> None:
    """Inject the published base-cell constants when available as
    retrieved public content:
      face_ijk_base_cells: nested [face][i][j][k] -> (base_cell,
        ccw_rot60) for i,j,k in 0..2 (the res-0 overlap lattice),
      base_cell_data: sequence of (home_face, (i, j, k), is_pentagon)
        per base cell 0..121.
    After injection geo_to_h3 resolves (face, res-0 ijk) to the
    canonical base cell + orientation and emits library-laid-out ids
    via h3pack's digit machinery."""
    global _BASE_CELL_TABLES
    fib = np.asarray(face_ijk_base_cells)
    if fib.shape[:4] != (20, 3, 3, 3):
        raise ValueError("face_ijk_base_cells must be [20][3][3][3][2]")
    if len(base_cell_data) != 122:
        raise ValueError("base_cell_data must have 122 entries")
    _BASE_CELL_TABLES = (fib, list(base_cell_data))


def base_cell_tables_available() -> bool:
    return _BASE_CELL_TABLES is not None


def geo_to_h3(lat, lng, res: int):
    """Full library-compatible encode — requires the base-cell tables
    (set_base_cell_tables). Raises a loud, actionable error until the
    tables are supplied; the projection half (geo_to_face_ijk) and the
    digit half (h3pack.h3_from_axial) are both live and tested."""
    if _BASE_CELL_TABLES is None:
        raise NotImplementedError(
            "base-cell resolution needs the published 122-entry "
            "faceIjkBaseCells/baseCellData constants (not derivable "
            "from first principles); supply them via "
            "set_base_cell_tables() — see NOTES.md 'retrieval request'"
        )
    raise NotImplementedError("wire-up pending table delivery")
