"""Benchmark sweep workflow (SURVEY §3.3): methods x parametrizations
-> mesh -> re-rasterize -> error stats -> stats table + CSV, with
per-parametrization resume markers.

Re-expresses /root/reference/src/benchmark_workflow.cpp:975-1073 (the
reference's test-and-perf oracle) Spark-first:

  - the reference loops method x param over ONE raster file on one
    core; here each (method, param) run is a distributed job over all
    tiles, and the per-raster error stats are combined EXACTLY from
    per-tile moments (count/mean/population-std merge — the same
    Welford algebra Mesh2Raster.cpp:351-491 accumulates serially)
  - parameter sets are the reference's own:
    param_max_error (benchmark_workflow.cpp:554-555) for terra/zemlya,
    param_step (benchmark_workflow.cpp:420) for dense
  - resume: a `<method>_<param>.done` marker per parametrization and
    append-mode CSV, like the reference's benchmark_done files
    (benchmark_workflow.cpp:591-613, :942-944)
  - CSV columns follow StatsRow (benchmark_workflow.cpp:29-51)

The per-tile `err_max <= param_max_error` invariant (terra/zemlya
refine until the max interior error is below the threshold) is the
strongest self-oracle available without GDAL fixtures; the sweep emits
a `violations` column that must be 0.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import geocode_exprs as GX
from ..operators.meshing import cell_grid

# benchmark_workflow.cpp:554-555
PARAM_MAX_ERROR = [
    0.1, 0.25, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0, 1.1, 1.2, 1.5, 2.0, 2.5, 3.0,
    5.0, 8.0, 10.0,
]
# benchmark_workflow.cpp:420
PARAM_STEP = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 16, 18, 20]
# benchmark_workflow.cpp:488-489
PARAM_THRESHOLD = [0.1, 0.2, 0.3, 0.5, 0.8, 1.0, 1.2, 1.4, 1.6, 1.8, 2.0, 2.5, 3.0]

SWEEP_SCHEMA = (
    "tile_x BIGINT, tile_y BIGINT, n_points BIGINT, n_vertices INT, "
    "n_faces INT, mesh_seconds DOUBLE, err_n BIGINT, err_mean DOUBLE, "
    "err_std DOUBLE, err_max DOUBLE"
)

CSV_HEADER = (
    "input_file,method_name,input_num_points,param_max_error,param_threshold,"
    "param_step,meshing_time_seconds,standard_dev_error,mean_error,max_error,"
    "num_vertices,num_faces,violations"
)


def _make_sweep_kernel(zoom: int, grid_bits: int, buffer_cells: int,
                       method: str, max_error: float, step: int,
                       threshold: float = float("nan")):
    g = 1 << grid_bits
    b = buffer_cells
    tile_m = GX.tile_size_meters(zoom)
    cellsize = tile_m / g
    hc = GX.HALF_CIRCUMFERENCE

    def sweep_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        import time

        from tin_terrain_spark.kernels.dense import generate_tin_dense_quadwalk
        from tin_terrain_spark.kernels.mesh2raster import measure_error, rasterise_mesh
        from tin_terrain_spark.kernels.raster import Grid
        from tin_terrain_spark.kernels.terra import generate_tin_terra
        from tin_terrain_spark.kernels.zemlya import generate_tin_zemlya

        tile_x = int(pdf["tile_x"].iloc[0])
        tile_y = int(pdf["tile_y"].iloc[0])
        size = g + 2 * b
        z = np.full((size, size), np.nan)
        z[pdf["row_b"].to_numpy(), pdf["col_b"].to_numpy()] = (
            pdf["z_sum"].to_numpy() / pdf["z_cnt"].to_numpy()
        )
        n_points = int(
            pdf.loc[
                (pdf["row_b"] >= b) & (pdf["row_b"] < g + b)
                & (pdf["col_b"] >= b) & (pdf["col_b"] < g + b),
                "z_cnt",
            ].sum()
        )
        res = 2.0 * hc / 256.0 / (1 << zoom)
        grid = Grid(
            z,
            xpos=tile_x * 256.0 * res - hc - b * cellsize,
            ypos=tile_y * 256.0 * res - hc - b * cellsize,
            cellsize=cellsize,
            ndv=np.nan,
        )
        t0 = time.perf_counter()
        if method == "terra":
            verts, faces = generate_tin_terra(grid, max_error)
        elif method == "zemlya":
            verts, faces = generate_tin_zemlya(grid, max_error)
        elif method == "dense":
            verts, faces = generate_tin_dense_quadwalk(grid, step)
        elif method == "curvature":
            from tin_terrain_spark.kernels.curvature import generate_tin_curvature

            verts, faces = generate_tin_curvature(grid, threshold)
        else:
            raise ValueError(f"unknown meshing method {method!r}")
        mesh_seconds = time.perf_counter() - t0

        err_n, err_mean, err_std, err_max = 0, 0.0, 0.0, float("nan")
        if len(faces):
            r = rasterise_mesh(verts, faces, size, size)
            src = Grid(np.where(np.isnan(z), -99999.0, z), ndv=-99999.0)
            err_mean, err_std, err_max, err_n, _ = measure_error(r, src)
            if err_n == 0:
                err_max = float("nan")

        return pd.DataFrame(
            [
                {
                    "tile_x": tile_x,
                    "tile_y": tile_y,
                    "n_points": n_points,
                    "n_vertices": int(len(verts)),
                    "n_faces": int(len(faces)),
                    "mesh_seconds": mesh_seconds,
                    "err_n": int(err_n),
                    "err_mean": float(err_mean),
                    "err_std": float(err_std),
                    "err_max": float(err_max),
                }
            ]
        )

    return sweep_tile


def run_parametrization(points: DataFrame, zoom: int, method: str,
                        max_error: float = float("nan"), step: int = -1,
                        threshold: float = float("nan"),
                        grid_bits: int = 5, buffer_cells: int = 2,
                        cells: DataFrame | None = None) -> dict:
    """One (method, param) run: distributed mesh+measure over all tiles,
    exact moment merge to a single StatsRow-shaped dict."""
    spark = points.sparkSession
    if cells is None:
        cells = cell_grid(points, zoom, grid_bits, buffer_cells)
    cells = cells.repartition(
        spark.sparkContext.defaultParallelism, "tile_x", "tile_y"
    )
    kernel = _make_sweep_kernel(
        zoom, grid_bits, buffer_cells, method, max_error, step, threshold
    )
    per_tile = cells.groupBy("tile_x", "tile_y").applyInPandas(kernel, SWEEP_SCHEMA)

    is_terra_like = method in ("terra", "zemlya")
    agg = per_tile.agg(
        F.sum("n_points").alias("input_num_points"),
        F.sum("n_vertices").alias("num_vertices"),
        F.sum("n_faces").alias("num_faces"),
        F.sum("mesh_seconds").alias("meshing_time_seconds"),
        F.sum("err_n").alias("n"),
        F.sum(F.col("err_mean") * F.col("err_n")).alias("sd"),
        # per-tile population variance + mean² recover E[d²] per tile;
        # count-weighting merges tiles exactly (Welford merge algebra)
        F.sum(
            (F.col("err_std") * F.col("err_std") + F.col("err_mean") * F.col("err_mean"))
            * F.col("err_n")
        ).alias("sd2"),
        F.max("err_max").alias("max_error"),
        (
            F.sum(
                F.when(F.col("err_max") > max_error, 1).otherwise(0)
            ).alias("violations")
            if is_terra_like
            else F.lit(0).alias("violations")
        ),
    ).collect()[0]

    n = agg["n"] or 0
    mean = agg["sd"] / n if n else float("nan")
    var = agg["sd2"] / n - mean * mean if n else float("nan")
    nanf = float("nan")
    return {
        "method_name": method,
        "input_num_points": agg["input_num_points"],
        "param_max_error": max_error,
        "param_threshold": threshold,
        "param_step": step,
        "meshing_time_seconds": agg["meshing_time_seconds"],
        "standard_dev_error": float(np.sqrt(max(var, 0.0))) if n else nanf,
        "mean_error": mean,
        # null when every tile's err_max was NaN (pandas NaN → Spark null)
        "max_error": nanf if agg["max_error"] is None else agg["max_error"],
        "num_vertices": agg["num_vertices"],
        "num_faces": agg["num_faces"],
        "violations": int(agg["violations"]),
    }


def run_benchmark_sweep(points: DataFrame, zoom: int, out_dir: str,
                        input_name: str = "points",
                        methods=("terra", "zemlya", "dense", "curvature"),
                        max_errors=None, steps=None, thresholds=None,
                        grid_bits: int = 5, buffer_cells: int = 2,
                        resume: bool = True) -> list[dict]:
    """The full sweep: methods x their parameter sets, CSV + .done
    markers in out_dir (benchmark_workflow.cpp:975-1073 shape). Returns
    the stats rows written this invocation (resumed rows are skipped,
    like the reference's benchmark_done fast-path)."""
    max_errors = PARAM_MAX_ERROR if max_errors is None else max_errors
    steps = PARAM_STEP if steps is None else steps
    thresholds = PARAM_THRESHOLD if thresholds is None else thresholds
    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "tin_terrain_benchmarks.csv")
    if not (resume and os.path.exists(csv_path)):
        with open(csv_path, "w") as f:
            f.write(CSV_HEADER + "\n")

    # cell aggregation is shared by every parametrization — persist once
    cells = cell_grid(points, zoom, grid_bits, buffer_cells).persist()
    runs = []
    for method in methods:
        if method == "dense":
            params = steps
        elif method == "curvature":
            params = thresholds
        else:
            params = max_errors
        for p in params:
            tag = f"{method}_{p}"
            marker = os.path.join(out_dir, f"{tag}.done")
            if resume and os.path.exists(marker):
                continue
            if method == "dense":
                kwargs = {"step": int(p)}
            elif method == "curvature":
                kwargs = {"threshold": float(p)}
            else:
                kwargs = {"max_error": float(p)}
            row = run_parametrization(
                points, zoom, method, grid_bits=grid_bits,
                buffer_cells=buffer_cells, cells=cells, **kwargs,
            )
            row["input_file"] = input_name
            with open(csv_path, "a") as f:
                f.write(
                    f'{row["input_file"]},{row["method_name"]},{row["input_num_points"]},'
                    f'{row["param_max_error"]},{row["param_threshold"]},{row["param_step"]},'
                    f'{row["meshing_time_seconds"]:.6f},{row["standard_dev_error"]:.9f},'
                    f'{row["mean_error"]:.9f},{row["max_error"]:.9f},'
                    f'{row["num_vertices"]},{row["num_faces"]},{row["violations"]}\n'
                )
            with open(marker, "w") as f:
                f.write("done\n")
            runs.append(row)
    cells.unpersist()
    return runs
