"""Single-core kernel throughput — the figure comparable to the
reference's published terra number (tntn_benchmarks.csv: 17.0M cells in
16.4 s single-thread ≈ 1.03M cells/s/core on a smooth real DEM).

Two workloads:
  smooth   512x512 smooth synthetic DEM (Crater-Lake-like relief,
           ~3% of cells inserted at max_error=2) — the apples-to-apples
           case: greedy meshing cost is dominated by triangle scans.
  noise    68x68 hash-noise tile (the engine's actual web-point
           workload shape, ~70% of cells inserted) — the worst case
           for greedy refinement; no published reference figure exists
           for this regime.

Prints one JSON line; run_scaling.py embeds it in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tin_terrain_spark.kernels.raster import Grid  # noqa: E402
from tin_terrain_spark.kernels.terra import generate_tin_terra  # noqa: E402
from tin_terrain_spark.kernels.zemlya import generate_tin_zemlya  # noqa: E402


def best_of(fn, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def main() -> None:
    n = 512
    x = np.linspace(0, 6, n)
    X, Y = np.meshgrid(x, x)
    smooth = (
        np.sin(X) * np.cos(Y * 0.7) * 400
        + np.exp(-((X - 3) ** 2 + (Y - 3) ** 2)) * 800
        + X * 30
    )
    t_s, (v_s, f_s) = best_of(lambda: generate_tin_terra(Grid(smooth.copy()), 2.0))
    t_s_py, (v_s_py, _) = best_of(
        lambda: generate_tin_terra(Grid(smooth.copy()), 2.0, use_native=False), 1
    )
    assert len(v_s_py) == len(v_s)

    m = 68
    rng = np.random.RandomState(7)
    xx = np.linspace(0, 1, m)
    XX, YY = np.meshgrid(xx, xx)
    noise = np.sin(XX * 9) * np.cos(YY * 7) * 30 + rng.rand(m, m) * 8
    t_n, (v_n, f_n) = best_of(lambda: generate_tin_terra(Grid(noise.copy()), 2.0), 5)
    t_z, (v_z, f_z) = best_of(lambda: generate_tin_zemlya(Grid(noise.copy()), 2.0))

    print(
        json.dumps(
            {
                "terra_smooth_512": {
                    "sec": round(t_s, 3),
                    "cells_per_sec": round(n * n / t_s),
                    "verts": len(v_s),
                    "insert_frac": round(len(v_s) / (n * n), 4),
                },
                "terra_noise_68": {
                    "sec": round(t_n, 4),
                    "cells_per_sec": round(m * m / t_n),
                    "verts": len(v_n),
                    "insert_frac": round(len(v_n) / (m * m), 4),
                },
                "zemlya_noise_68": {"sec": round(t_z, 4), "verts": len(v_z)},
                "terra_smooth_512_python_fallback": {
                    "sec": round(t_s_py, 3),
                    "cells_per_sec": round(n * n / t_s_py),
                },
                "native_kernel": __import__(
                    "tin_terrain_spark.kernels.native", fromlist=["native_available"]
                ).native_available(),
                "reference_terra_cells_per_sec_per_core": 1030000,
            }
        )
    )


if __name__ == "__main__":
    main()
