"""Round-6 optimization bench harness (bench.py is FROZEN for
measurement — this file exists so optimization work can time subsets
of the catalog, with the same methodology: .count() actions, min-of-N
per query, clearCache between runs).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [q ...]
    # optional: REPS=3 (default), NOOP=1 to use the noop sink instead
    # of count() (guide §1.4 isolation)

Prints one JSON line {"queries": {name: sec}, "rows": {name: n}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("REPS", "3"))
    use_noop = os.environ.get("NOOP", "") == "1"
    names = sys.argv[1:]

    import bench as B
    from tin_terrain_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cores)

    # same warm-up as bench.py
    from tin_terrain_spark.operators.geocode import geocode_points
    from tin_terrain_spark.operators.meshing import mesh_tiles

    warm_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    warm = geocode_points(warm_docs, zoom=1, grid_bits=5)
    mesh_tiles(warm, zoom=1, method="terra", max_error=2.0).count()

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, (_cat, fn) in B.bench_queries().items():
        if names and name not in names:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best = float("inf")
        n = -1
        for _ in range(reps):
            t0 = time.time()
            df = fn(spark, sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                n = df.count()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        times[name] = round(best, 3)
        rows[name] = n
        print(f"# {name}: {best:.3f}s rows={n}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"queries": times, "rows": rows, "sf_dir": sf_dir,
                      "reps": reps, "noop": use_noop}))


if __name__ == "__main__":
    main()
