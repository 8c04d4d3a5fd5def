"""Dump .explain('formatted') for catalog queries to plans/r06/.

Usage:
    python scripts/dump_plans_r06.py before [query ...]
    python scripts/dump_plans_r06.py after  [query ...]

With no query names, dumps every bench catalog entry. Used for the
round-6 optimization evidence (plans/r06/<query>_{before,after}.txt).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
)


def main(tag: str, *names: str, sf_dir: str = "/root/testdata/sf0.01"):
    import bench as B
    from tin_terrain_spark.session import get_spark

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plans_r06", cores=8)
    qs = B.bench_queries()
    for name, (_cat, fn) in qs.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            txt = f"PLAN FAILED: {e}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"{name}: {len(txt)} bytes -> {path}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
