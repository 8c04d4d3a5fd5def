"""Deterministic geocoding + TMS tile-key SQL expression templates.

One source of truth for BOTH engines: each function returns an ANSI-SQL
string that parses identically in Spark SQL and DuckDB, using only
integer multiply/add/mod (no overflow at our id ranges — max id ~1e7,
max intermediate ~5e18 < 2^63) and IEEE-double +,-,*,/ with
ceil/floor — every operation is exactly rounded, so Spark and DuckDB
produce bit-identical doubles.

Geocoding (FIXTURES.md §1): pages are placed uniformly in Web-Mercator
meters via two independent 2-round LCG-style hashes of the page id —
i.e. uniform in mercator y ≡ the reference's EPSG:3857 assumption
(SURVEY.md §1.5). The tile key uses the reference's exact pipeline:
meters → pixels at zoom (MercatorProjection.cpp:39-47) → ceil(p/256)-1
(the right/top-edge tie rule, MercatorProjection.cpp:48-56).
"""

from __future__ import annotations

HALF_CIRCUMFERENCE = 20037508.342789243  # reference MercatorProjection.h:31
TILE_SIZE = 256
_MOD = 2147483647  # 2^31 - 1


def dlit(x: float) -> str:
    """Float literal in e-notation: BOTH Spark and DuckDB parse
    exponent literals as DOUBLE (plain decimal-point literals are
    DECIMAL in DuckDB, with different cast/overflow semantics)."""
    return f"{float(x):.17e}"

# (mul1, add1, mul2, add2) per independent uniform stream
_STREAMS = {
    "u1": (2654435761, 1013904223, 1664525, 1013904223),
    "u2": (2246822519, 3266489917, 69069, 362437),
    "u3": (2654435789, 40503, 2246822519, 12345),
}


def u_hash_sql(id_col: str, stream: str) -> str:
    """Uniform [0,1) double from a bigint id — exact integer arithmetic,
    identical in Spark and DuckDB."""
    m1, a1, m2, a2 = _STREAMS[stream]
    return (
        f"(CAST((((CAST({id_col} AS BIGINT) * {m1} + {a1}) % {_MOD}) * {m2} + {a2}) % {_MOD} "
        f"AS DOUBLE) / {dlit(_MOD)})"
    )


def mercator_x_sql(id_col: str) -> str:
    """x uniform in [-HC, HC)."""
    return f"({dlit(-HALF_CIRCUMFERENCE)} + {dlit(2.0 * HALF_CIRCUMFERENCE)} * {u_hash_sql(id_col, 'u1')})"


def mercator_y_sql(id_col: str) -> str:
    return f"({dlit(-HALF_CIRCUMFERENCE)} + {dlit(2.0 * HALF_CIRCUMFERENCE)} * {u_hash_sql(id_col, 'u2')})"


def hash_z_sql(id_col: str) -> str:
    """Exact-arithmetic synthetic height in [-100, 100) for
    oracle-checked aggregation queries (no transcendentals)."""
    return f"({dlit(-100.0)} + {dlit(200.0)} * {u_hash_sql(id_col, 'u3')})"


def dem_z_sql(x_sql: str, y_sql: str) -> str:
    """FIXTURES.md §3 synthetic DEM (smooth + detail bands). Uses sin —
    only for the meshing path (never oracle-value-compared raw)."""
    return (
        f"(100.0 * SIN(({x_sql}) / 5000.0) * SIN(({y_sql}) / 5000.0) "
        f"+ 10.0 * SIN(({x_sql}) / 700.0) * COS(({y_sql}) / 900.0))"
    )


def pixels_sql(m_sql: str, zoom: int, tile_size: int = TILE_SIZE) -> str:
    """meters → global pixels (MercatorProjection.cpp:39-47): the C++
    computes invRes = 2^z / (2*HC/ts) then (m + HC) * invRes."""
    m_res = 2.0 * HALF_CIRCUMFERENCE / tile_size
    return f"((({m_sql}) + {dlit(HALF_CIRCUMFERENCE)}) * ({dlit(1 << zoom)} / {dlit(m_res)}))"


def tile_sql(m_sql: str, zoom: int, tile_size: int = TILE_SIZE) -> str:
    """meters → tile index with the ceil-1 tie rule
    (MercatorProjection.cpp:48-65)."""
    px = pixels_sql(m_sql, zoom, tile_size)
    return f"(CAST(CEIL({px} / {dlit(tile_size)}) AS BIGINT) - 1)"


def cell_sql(m_sql: str, zoom: int, grid_bits: int) -> str:
    """Grid-cell index = tile index at zoom+grid_bits — the per-tile
    raster cell with the same tie rule (grid_n = 2^grid_bits cells per
    tile side)."""
    return tile_sql(m_sql, zoom + grid_bits)


def tile_min_sql(t_sql: str, zoom: int, tile_size: int = TILE_SIZE) -> str:
    """tile index → min meters coordinate (TileBounds,
    MercatorProjection.cpp:76-80 via PixelsToMeters :30-37)."""
    res = 2.0 * HALF_CIRCUMFERENCE / tile_size / (1 << zoom)
    # the trailing `+ 0e0` normalizes IEEE -0.0 to 0.0 so both engines
    # serialize the tile-corner-at-origin case identically
    return f"(((({t_sql}) * {dlit(tile_size)}) * {dlit(res)} - {dlit(HALF_CIRCUMFERENCE)}) + 0e0)"


def tile_size_meters(zoom: int) -> float:
    return 2.0 * HALF_CIRCUMFERENCE / (1 << zoom)


def url_sql(id_col: str) -> str:
    """FIXTURES.md §1 synthetic url, 1:1 with the page id."""
    return (
        f"CONCAT('https://host', CAST({id_col} % 100 AS STRING), "
        f"'.example/p/', CAST({id_col} AS STRING))"
    )
