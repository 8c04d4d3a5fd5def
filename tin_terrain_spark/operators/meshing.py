"""The flagship distributed operator: per-tile TIN meshing (Y3/Y4).

Pipeline (reference dem2tintiles, SURVEY.md §3.1), Spark-first:

  points(x, y, z, tile, cell)
    → border-buffer fan-out: a point within `buffer_cells` grid cells of
      a tile edge is duplicated into the neighbor tile's buffered raster
      (the reference buffers partitions by resolution*100 m so border
      triangles survive clipping — dem2tintiles_workflow.cpp:51-53);
      bounded 1:≤4 row expansion, pure Column exprs
    → groupBy(tile, row, col).agg(sum(z), count)   ← map-side combine
      collapses 10^12 points to ≤ (grid_n+2b)² rows per tile BEFORE the
      heavy shuffle (this is the scale-critical step)
    → repartition(tile) → sortWithinPartitions(tile) → streaming
      mapInPandas(mesh_tile_kernel) — walk contiguous tile runs per
      Arrow batch (one Python round per ~hundreds of tiles, not one
      pandas group per tile), assemble the dense grid, run
      Terra/Zemlya/dense greedy meshing, normalize to the unit tile,
      clip to [0,1]² (TileMaker.cpp:45-124), encode quantized-mesh
    → tiles(zoom, tile_x, tile_y, n_points, n_vertices, n_faces,
            max_err, terrain:binary)

Skew: hot tiles are bounded by construction — the pre-aggregation caps
any tile's kernel input at (grid_n+2b)² rows regardless of how many
points land in it, so no salting is needed for the mesh path itself;
the cell-level groupBy handles point skew via map-side partial
aggregation + AQE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import geocode_exprs as GX

TILE_SCHEMA = (
    "zoom INT, tile_x BIGINT, tile_y BIGINT, n_points BIGINT, "
    "n_cells INT, n_vertices INT, n_faces INT, max_err DOUBLE, "
    "min_z DOUBLE, max_z DOUBLE, terrain BINARY, "
    "euler_ok BOOLEAN, verts_on_grid_ok BOOLEAN, cover_ok BOOLEAN"
)


def base_cells(points: DataFrame) -> DataFrame:
    """The ONE heavy shuffle: 10^12 points → per-cell (sum, count)
    partial aggregates with map-side combine. Everything downstream
    (buffer fan-out, per-zoom rollup, tile grouping) operates on ~#cells
    rows. Output: cell_x, cell_y, z_sum, z_cnt."""
    return points.groupBy("cell_x", "cell_y").agg(
        F.sum("z").alias("z_sum"), F.count(F.lit(1)).alias("z_cnt")
    )


def rollup_cells(cells: DataFrame, levels: int) -> DataFrame:
    """Y2 overview reuse: coarsen the cell grid by `levels` powers of two
    by summing (sum, count) — the coarse cell's average stays the exact
    point-weighted mean (no re-scan of the raw table)."""
    if levels <= 0:
        return cells
    f = 1 << levels
    return (
        cells.groupBy(
            F.floor(F.col("cell_x") / f).cast("bigint").alias("cell_x"),
            F.floor(F.col("cell_y") / f).cast("bigint").alias("cell_y"),
        )
        .agg(F.sum("z_sum").alias("z_sum"), F.sum("z_cnt").alias("z_cnt"))
    )


def cell_grid(
    points: DataFrame,
    zoom: int,
    grid_bits: int = 5,
    buffer_cells: int = 2,
    cells: DataFrame | None = None,
) -> DataFrame:
    """points (geocoded at this zoom's cell resolution) → per-(tile,
    row,col) grid cells with border-buffer duplication. The 1:≤4
    fan-out happens AFTER aggregation, on cell rows, so its cost is
    independent of point count. Output: tile_x, tile_y, row_b, col_b,
    z_sum, z_cnt (row_b/col_b indexed into the buffered raster)."""
    g = 1 << grid_bits
    b = buffer_cells
    n_tiles = 1 << zoom

    c = cells if cells is not None else base_cells(points)
    # own tile + local coords (cell is the tile key at zoom+grid_bits)
    c = (
        c.withColumn("tile_x", F.floor(F.col("cell_x") / g).cast("bigint"))
        .withColumn("tile_y", F.floor(F.col("cell_y") / g).cast("bigint"))
        .withColumn("col0", F.col("cell_x") - F.col("tile_x") * g)
        .withColumn("row0", F.col("cell_y") - F.col("tile_y") * g)
    )

    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    candidates = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets]
    )
    c = c.withColumn(
        "nbr",
        F.explode(
            F.filter(
                candidates,
                lambda o: (
                    ((o.dx == 0) | ((o.dx == -1) & (F.col("col0") < b)) | ((o.dx == 1) & (F.col("col0") >= g - b)))
                    & ((o.dy == 0) | ((o.dy == -1) & (F.col("row0") < b)) | ((o.dy == 1) & (F.col("row0") >= g - b)))
                ),
            )
        ),
    )
    c = (
        c.withColumn("t_x", F.col("tile_x") + F.col("nbr.dx"))
        .withColumn("t_y", F.col("tile_y") + F.col("nbr.dy"))
        .filter(
            (F.col("t_x") >= 0)
            & (F.col("t_x") < n_tiles)
            & (F.col("t_y") >= 0)
            & (F.col("t_y") < n_tiles)
        )
        # buffered-raster indices: col_b in [0, g+2b)
        .withColumn("col_b", (F.col("cell_x") - F.col("t_x") * g + b).cast("int"))
        .withColumn("row_ll", (F.col("cell_y") - F.col("t_y") * g + b).cast("int"))
        .withColumn("row_b", F.lit(g + 2 * b - 1) - F.col("row_ll"))
    )
    return c.select(
        F.col("t_x").alias("tile_x"),
        F.col("t_y").alias("tile_y"),
        "row_b",
        "col_b",
        "z_sum",
        "z_cnt",
    )


def _make_tile_fn(zoom: int, grid_bits: int, buffer_cells: int, method: str,
                  max_error: float, step: int, compute_error: bool,
                  encode_terrain: bool):
    """Build the per-tile kernel as a plain-arrays → dict function
    (runs on executors; imports stay inside so the function pickles
    cleanly). Both the applyInPandas compat wrapper and the streaming
    mapInPandas path call this."""
    g = 1 << grid_bits
    b = buffer_cells
    tile_m = GX.tile_size_meters(zoom)
    cellsize = tile_m / g
    hc = GX.HALF_CIRCUMFERENCE

    def mesh_tile(tile_x: int, tile_y: int, rows: np.ndarray, cols: np.ndarray,
                  z_sum: np.ndarray, z_cnt: np.ndarray) -> dict:
        from tin_terrain_spark.kernels.codec import encode_qm_tile
        from tin_terrain_spark.kernels.dense import generate_tin_dense_quadwalk
        from tin_terrain_spark.kernels.geometry import clip_triangles_to_01_quadrant
        from tin_terrain_spark.kernels.mesh2raster import measure_error, rasterise_mesh
        from tin_terrain_spark.kernels.raster import Grid
        from tin_terrain_spark.kernels.terra import generate_tin_terra
        from tin_terrain_spark.kernels.zemlya import generate_tin_zemlya

        size = g + 2 * b
        z = np.full((size, size), np.nan)
        z[rows, cols] = z_sum / z_cnt
        interior = (rows >= b) & (rows < g + b) & (cols >= b) & (cols < g + b)
        n_points = int(z_cnt[interior].sum())
        n_cells = int(len(rows))

        # tile bounds in meters (PixelsToMeters, MercatorProjection.cpp:30-37)
        res = 2.0 * hc / 256.0 / (1 << zoom)
        tile_min_x = tile_x * 256.0 * res - hc
        tile_min_y = tile_y * 256.0 * res - hc

        grid = Grid(
            z,
            xpos=tile_min_x - b * cellsize,
            ypos=tile_min_y - b * cellsize,
            cellsize=cellsize,
            ndv=np.nan,
        )
        if method == "terra":
            verts, faces = generate_tin_terra(grid, max_error)
        elif method == "zemlya":
            verts, faces = generate_tin_zemlya(grid, max_error)
        elif method == "dense":
            verts, faces = generate_tin_dense_quadwalk(grid, step)
        elif method == "curvature":
            # the max_error slot carries the curvature threshold
            # (param_threshold in the reference's benchmark StatsRow)
            from tin_terrain_spark.kernels.curvature import generate_tin_curvature

            verts, faces = generate_tin_curvature(grid, max_error)
        else:
            raise ValueError(f"unknown meshing method {method!r}")

        max_err = float("nan")
        euler_ok = verts_on_grid_ok = cover_ok = None
        if compute_error and len(faces):
            r = rasterise_mesh(verts, faces, size, size)
            src = Grid(np.where(np.isnan(z), -99999.0, z), ndv=-99999.0)
            _, _, max_err, n_valid, _ = measure_error(r, src)
            if n_valid == 0:
                max_err = float("nan")

            # independent invariants, oracled as literal TRUE (a
            # wrong-but-deterministic kernel cannot pass them):
            #  - Euler bound for any planar triangulation on the
            #    PRE-clip mesh: f <= 2v - 4
            #  - every pre-clip vertex sits exactly on a grid cell
            #    center with z equal to that cell's (post-corner-repair)
            #    value — greedy insertion only ever promotes cells
            #  - the triangulation rasterizes back onto every interior
            #    source-valid pixel (full hull coverage, no holes)
            # NOTE max_err <= max_error is NOT an invariant of the
            # reference algorithm: the scanline restart-at-v0x quirk
            # (TerraMesh.cpp:150-166) leaves cells unscanned, and the
            # reference only RECORDS stats_row.max_error
            # (benchmark_workflow.cpp:880-924), never asserts it; the
            # measured value is frozen as a golden column instead.
            euler_ok = bool(len(faces) <= 2 * len(verts) - 4)
            vc = grid.x2col(verts[:, 0])
            vr = grid.y2row(verts[:, 1])
            inb = (vc >= 0) & (vc < size) & (vr >= 0) & (vr < size)
            if method == "zemlya":
                # zemlya vertices carry m_result z (pyramid averages,
                # ZemlyaMesh.cpp:358-385), not raw raster values — the
                # independent invariant is position-on-lattice plus z
                # inside the raster's value range (averages of samples
                # cannot escape [min, max])
                lo = float(np.nanmin(z)) if np.isfinite(z).any() else 0.0
                hi = float(np.nanmax(z)) if np.isfinite(z).any() else 0.0
                verts_on_grid_ok = bool(
                    inb.all()
                    and np.all(np.isfinite(verts[:, 2]))
                    and np.all(verts[:, 2] >= min(lo, 0.0) - 1e-9)
                    and np.all(verts[:, 2] <= max(hi, 0.0) + 1e-9)
                )
            else:
                verts_on_grid_ok = bool(
                    inb.all()
                    and np.array_equal(z[vr, vc], verts[:, 2], equal_nan=True)
                )
            src_in = src.z[2 : size - 2, 2 : size - 2]
            cover_ok = bool(n_valid == int((src_in != src.ndv).sum()))

        # normalize to unit tile space (TileMaker.cpp:71-105)
        tris = verts[faces]  # (m, 3, 3) world coords
        terrain = None
        n_vertices, n_faces = len(verts), len(faces)
        min_z = float(np.min(verts[:, 2])) if len(verts) else float("nan")
        max_z = float(np.max(verts[:, 2])) if len(verts) else float("nan")
        if encode_terrain and len(tris):
            zmin = tris[:, :, 2].min()
            zmax = tris[:, :, 2].max()
            inv_z = 1.0 / (zmax - zmin) if zmax > zmin else 1.0
            unit = tris.copy()
            unit[:, :, 0] = (unit[:, :, 0] - tile_min_x) / tile_m
            unit[:, :, 1] = (unit[:, :, 1] - tile_min_y) / tile_m
            unit[:, :, 2] = (unit[:, :, 2] - zmin) * inv_z
            clipped = clip_triangles_to_01_quadrant(unit)
            n_faces = len(clipped)
            if n_faces:
                from tin_terrain_spark.kernels.codec import _first_seen_vertex_order

                vorder = _first_seen_vertex_order(clipped.reshape(-1, 3))
            else:
                vorder = (np.zeros((0, 3)), np.zeros(0, dtype=np.int64))
            n_vertices = len(vorder[0])
            terrain = encode_qm_tile(
                clipped,
                (tile_min_x, tile_min_y, zmin),
                (tile_min_x + tile_m, tile_min_y + tile_m, zmax),
                mesh_is_rescaled=True,
                vertex_order=vorder,
            )

        return {
            "zoom": zoom,
            "tile_x": tile_x,
            "tile_y": tile_y,
            "n_points": n_points,
            "n_cells": n_cells,
            "n_vertices": int(n_vertices),
            "n_faces": int(n_faces),
            "max_err": max_err,
            "min_z": min_z,
            "max_z": max_z,
            "terrain": terrain,
            "euler_ok": euler_ok,
            "verts_on_grid_ok": verts_on_grid_ok,
            "cover_ok": cover_ok,
        }

    return mesh_tile


_TILE_COLS = (
    "zoom", "tile_x", "tile_y", "n_points", "n_cells", "n_vertices",
    "n_faces", "max_err", "min_z", "max_z", "terrain", "euler_ok",
    "verts_on_grid_ok", "cover_ok",
)


def _make_mesh_kernel(*args):
    """applyInPandas-compatible wrapper around _make_tile_fn (kept for
    the pipeline/benchmark callers that group per tile)."""
    tile_fn = _make_tile_fn(*args)

    def mesh_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        d = tile_fn(
            int(pdf["tile_x"].iloc[0]), int(pdf["tile_y"].iloc[0]),
            pdf["row_b"].to_numpy(), pdf["col_b"].to_numpy(),
            pdf["z_sum"].to_numpy(), pdf["z_cnt"].to_numpy(),
        )
        return pd.DataFrame([d], columns=_TILE_COLS)

    return mesh_tile


def _make_stream_kernel(*args):
    """mapInPandas generator over TILE-SORTED partitions: walks
    contiguous (tile_x, tile_y) runs inside each Arrow batch with
    NumPy slicing and emits ONE output DataFrame per batch (hundreds
    of tiles) instead of one per tile. applyInPandas pays a pandas
    sub-DataFrame + 1-row result DataFrame per group — measured ~8 ms
    of per-tile overhead at 65k-tile scale, more than the mesh kernel
    itself. A tile whose rows span two Arrow batches is carried over
    in `buf` (rows per tile are contiguous because the partition is
    sorted by the tile key)."""
    tile_fn = _make_tile_fn(*args)

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = pdf["tile_x"].to_numpy()
        ty = pdf["tile_y"].to_numpy()
        rb = pdf["row_b"].to_numpy()
        cb = pdf["col_b"].to_numpy()
        zs = pdf["z_sum"].to_numpy()
        zc = pdf["z_cnt"].to_numpy()
        change = np.empty(len(tx), dtype=bool)
        change[0] = True
        change[1:] = (tx[1:] != tx[:-1]) | (ty[1:] != ty[:-1])
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], len(tx))
        out = [
            tile_fn(int(tx[s]), int(ty[s]), rb[s:e], cb[s:e], zs[s:e], zc[s:e])
            for s, e in zip(starts, ends)
        ]
        return pd.DataFrame(out, columns=_TILE_COLS)

    def gen(batches):
        buf = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            if not len(pdf):
                continue
            tx = pdf["tile_x"].to_numpy()
            ty = pdf["tile_y"].to_numpy()
            # the last group may continue in the next batch — hold it
            eq = (tx == tx[-1]) & (ty == ty[-1])
            nz = np.nonzero(~eq)[0]
            start_last = int(nz[-1]) + 1 if len(nz) else 0
            buf = pdf.iloc[start_last:]
            if start_last:
                yield process(pdf.iloc[:start_last])
        if buf is not None and len(buf):
            yield process(buf)

    return gen


def mesh_tiles(
    points: DataFrame,
    zoom: int,
    grid_bits: int = 5,
    buffer_cells: int = 2,
    method: str = "terra",
    max_error: float = 2.0,
    step: int = 1,
    compute_error: bool = False,
    encode_terrain: bool = True,
    mesh_parallelism: int | None = None,
) -> DataFrame:
    """Full tile-meshing operator: geocoded points → tile records.

    Degenerate tiles (too sparse to carry information) still mesh —
    corner repair (TerraUtils.cpp:8-22) back-fills from the nearest
    valid cells, exactly as the reference handles no-data regions.

    The explicit repartition before the kernel matters: the cell grid
    is only KBs after aggregation, so AQE would coalesce it to one
    partition and serialize the CPU-heavy Python kernels behind it
    (measured 3-5x slower). A user repartition by the group key is
    respected by AQE, keeps the hash partitioning applyInPandas needs
    (no extra shuffle), and sizes tasks by kernel cost, not bytes."""
    cells = cell_grid(points, zoom, grid_bits, buffer_cells)
    spark = cells.sparkSession
    if mesh_parallelism is None:
        mesh_parallelism = spark.sparkContext.defaultParallelism
    cells = cells.repartition(mesh_parallelism, "tile_x", "tile_y")
    # tile-sorted partitions + streaming mapInPandas: one Python/Arrow
    # round per BATCH of tiles, not one pandas group per tile (the
    # per-group overhead dominated the kernel at 65k-tile scale)
    cells = cells.sortWithinPartitions("tile_x", "tile_y")
    kernel = _make_stream_kernel(
        zoom, grid_bits, buffer_cells, method, max_error, step,
        compute_error, encode_terrain,
    )
    return cells.mapInPandas(kernel, TILE_SCHEMA)
