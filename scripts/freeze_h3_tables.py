"""Freeze the numerically derived H3 base-cell tables into the
packaged artifact tin_terrain_spark/functions/h3_base_tables.json.

The derivation (h3base._derive_base_cells_numeric) is deterministic
within an environment but ULP-sensitive to the CPU's vectorized
transcendental kernels across environments; the artifact pins the
engine-canonical numbering so minted ids are stable. Rerun ONLY on an
intentional derivation change, then refreeze the h3_global golden
(scripts/freeze_goldens.py) since minted ids may move.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    from tin_terrain_spark.functions import h3base

    path = h3base.save_tables_artifact()
    print(f"wrote {path}")
    # verify the artifact loads and round-trips the derivation exactly
    h3base.derive_base_cells.cache_clear()
    loaded = h3base.derive_base_cells()
    numeric = h3base._derive_base_cells_numeric()
    for field in ("lookup_bc", "lookup_rot", "bc_home_face", "bc_home_ijk",
                  "bc_home_rot", "bc_is_pentagon", "bc_center",
                  "bc_rep_count", "bc_rep_face", "bc_rep_ijk", "bc_rep_rot"):
        np.testing.assert_array_equal(
            getattr(loaded, field), getattr(numeric, field), err_msg=field
        )
    assert loaded.bc_faces == numeric.bc_faces
    print("artifact == numeric derivation: OK")


if __name__ == "__main__":
    main()
