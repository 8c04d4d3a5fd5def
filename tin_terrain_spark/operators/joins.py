"""Spatial joins built on the tile/cell index (SURVEY.md §2.5 J5/J6).

J5 point-in-polygon: polygon → covering tile range (broadcast) →
equi-join on tile key → exact predicate refine. The tile prefilter is
semantics-free: the tile function is monotone, so every point whose
coordinate lies in [min, max] falls in a covering tile; the exact
`between` refine applies the reference's eps-padded containment
(geometrix.cpp:256-260) with eps=0 for exact oracle parity.

J6 kNN: grid-ring expansion — candidates from the Chebyshev ring of
cells around each query, exact distance refine + per-query top-k
window, with the correctness guarantee enforced by expansion: a query's
result is final only when its k-th distance is ≤ the ring's guaranteed
radius (ring_r * cell_size, the geometry the reference uses for
buffered partitions, dem2tintiles_workflow.cpp:51-53); unresolved
queries re-run with a doubled ring. Brute-force variant provided as the
oracle-checked baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions import geocode_exprs as GX


def polygons_df(spark, n: int = 24, seed_base: int = 7777):
    """Deterministic axis-aligned query boxes derived from the same
    integer hash streams (reproducible in SQL for the oracle)."""
    r = spark.range(n).withColumnRenamed("id", "poly_id")
    cx = GX.mercator_x_sql(f"(poly_id + {seed_base})")
    cy = GX.mercator_y_sql(f"(poly_id + {seed_base})")
    half = f"({GX.dlit(100000.0)} + {GX.dlit(1500000.0)} * {GX.u_hash_sql(f'(poly_id + {seed_base})', 'u3')})"
    return (
        r.withColumn("pmin_x", F.expr(f"{cx} - {half}"))
        .withColumn("pmax_x", F.expr(f"{cx} + {half}"))
        .withColumn("pmin_y", F.expr(f"{cy} - {half}"))
        .withColumn("pmax_y", F.expr(f"{cy} + {half}"))
    )


def polygons_sql(n: int = 24, seed_base: int = 7777) -> str:
    cx = GX.mercator_x_sql(f"(poly_id + {seed_base})")
    cy = GX.mercator_y_sql(f"(poly_id + {seed_base})")
    half = f"({GX.dlit(100000.0)} + {GX.dlit(1500000.0)} * {GX.u_hash_sql(f'(poly_id + {seed_base})', 'u3')})"
    return f"""
      SELECT poly_id,
             {cx} - {half} AS pmin_x, {cx} + {half} AS pmax_x,
             {cy} - {half} AS pmin_y, {cy} + {half} AS pmax_y
      FROM (SELECT CAST(range AS BIGINT) AS poly_id FROM range({n}))
    """


def pip_join(points: DataFrame, polys: DataFrame, zoom: int) -> DataFrame:
    """J5: cell-indexed point-in-polygon. polys gets exploded to its
    covering tiles (bounded fan-out), broadcast, equi-joined on the tile
    key, then exactly refined — Catalyst turns this into a broadcast
    hash join with the `between` conjunction as a post-filter."""
    spark = points.sparkSession  # noqa: F841  (kept for symmetry)
    pt = polys.select(
        "poly_id",
        "pmin_x",
        "pmax_x",
        "pmin_y",
        "pmax_y",
        F.expr(GX.tile_sql("pmin_x", zoom)).alias("tx0"),
        F.expr(GX.tile_sql("pmax_x", zoom)).alias("tx1"),
        F.expr(GX.tile_sql("pmin_y", zoom)).alias("ty0"),
        F.expr(GX.tile_sql("pmax_y", zoom)).alias("ty1"),
    )
    n_tiles = 1 << zoom
    covering = pt.select(
        "poly_id",
        "pmin_x",
        "pmax_x",
        "pmin_y",
        "pmax_y",
        F.explode(
            F.sequence(F.greatest(F.col("tx0"), F.lit(0)), F.least(F.col("tx1"), F.lit(n_tiles - 1)))
        ).alias("tile_x"),
        F.col("ty0"),
        F.col("ty1"),
    ).select(
        "poly_id",
        "pmin_x",
        "pmax_x",
        "pmin_y",
        "pmax_y",
        "tile_x",
        F.explode(
            F.sequence(F.greatest(F.col("ty0"), F.lit(0)), F.least(F.col("ty1"), F.lit(n_tiles - 1)))
        ).alias("tile_y"),
    )
    joined = points.join(F.broadcast(covering), ["tile_x", "tile_y"], "inner")
    return joined.filter(
        F.col("x").between(F.col("pmin_x"), F.col("pmax_x"))
        & F.col("y").between(F.col("pmin_y"), F.col("pmax_y"))
    )


def knn_brute(points: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """J6 baseline: exact brute-force kNN via broadcast cross join +
    per-query top-k window. dist2 is exact IEEE arithmetic (mul/add),
    so it hash-compares across engines without rounding."""
    q = queries.select(
        F.col("q_id"), F.col("x").alias("qx"), F.col("y").alias("qy")
    )
    cand = points.select("doc_id", "x", "y").crossJoin(F.broadcast(q))
    cand = cand.withColumn(
        "dist2",
        (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
        + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy")),
    )
    w = W.partitionBy("q_id").orderBy(F.col("dist2").asc(), F.col("doc_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "doc_id", "rank", "dist2")
    )


def _density_ring(pts: DataFrame, k: int, cell_m: float,
                  geometry: str) -> int | None:
    """Size the FIRST ring so one round resolves well-distributed data:
    one aggregate over the points (count + xy bounding box) gives the
    areal density; the ring radius is chosen so the guarantee circle
    (the distance below which nothing outside the ring can lie) is
    expected to hold ~8x k points. An under-estimate only costs an
    extra round (the guarantee check stays exact); an over-estimate
    only widens the candidate window. Returns None when the corpus is
    so small (n <= 32k) or so degenerate (zero-area bbox) that the
    brute crossJoin is the right plan outright.

    The factor was 32x k with a ring floor of 2 through round 5;
    measured at sf1.0 (1.44M points, 160k queries, ~22 points/cell)
    that yielded ring 2 -> 550 candidates per query for k = 5 — an
    88M-row candidate join where the 8x sizing picks ring 1 (~200
    candidates) and still leaves ~14x k points expected inside the
    guarantee circle; rare misses re-run at ring*4 for the handful of
    unresolved queries only.

    The denominator is the COVERED AREA, not the occupied-cell count:
    on sparse grids (most cells empty) occupied-cell density
    overestimates true density by the fill factor, which is exactly
    the regime where the first ring then misses its guarantee and the
    query pays fixed per-round coordination again.
    """
    import math

    row = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).collect()[0]
    n = row["n"] or 0
    if n <= 32 * k:
        return None
    dx = float(row["x1"] - row["x0"])
    dy = float(row["y1"] - row["y0"])
    area = dx * dy
    span = max(dx, dy)
    if area > 0.0:
        g = math.sqrt(8.0 * k * area / (math.pi * n))  # guarantee radius, m
    elif span > 0.0:
        # degenerate (collinear) corpus: 1-D density — expected k-th
        # distance ~ span * k / n; the brute crossJoin would be the
        # |points| x |queries| scale-killer exactly here
        g = 8.0 * k * span / n
    else:
        # every point identical: any ring >= 1 covers the whole corpus
        return 1
    if geometry == "square":
        # square-grid guarantee: R * cell_m  =>  R >= g / cell_m
        ring = int(math.ceil(g / cell_m))
    else:
        # hex staircase guarantee: (1.5 (R+1) - 2) * s  >=  g
        ring = int(math.ceil((g / cell_m + 2.0) / 1.5 - 1.0))
    return max(1, ring)


def _knn_rounds(pts: DataFrame, q: DataFrame, k: int, initial_ring: int,
                max_rounds: int, cand_fn, guarantee_m, pts_persists,
                brute_pts: DataFrame) -> DataFrame:
    """Shared iterative driver for knn_ring / knn_hex: per round, build
    candidates within ring R of each unresolved query (cand_fn), refine
    by exact distance + per-query top-k, and mark a query FINAL when
    its k-th distance <= guarantee_m(R) (nothing outside the ring can
    be closer). Unresolved queries re-run with R*4; what survives
    max_rounds hits the brute crossJoin.

    Coordination is deliberately minimal: ONE action per round (the
    unresolved count, which doubles as the materializer for that
    round's persisted top-k — the split reads the ring join twice, and
    with a lazy DAG Spark would recompute the join per consumer). When
    round 1 resolves every query — the designed case, since the ring
    is density-sized — the result IS the round-1 cache: no semi-join,
    no extra materialize action; total cost is the density aggregate +
    one join round. No driver collect of data rows anywhere; counts
    are coordination, as in any LSH/ANN loop.
    """
    w = W.partitionBy("q_id").orderBy(F.col("dist2").asc(), F.col("doc_id").asc())
    done: DataFrame | None = None
    remaining = q
    ring = initial_ring
    round_caches: list[DataFrame] = []
    for _ in range(max_rounds):
        guarantee2 = float(guarantee_m(ring)) ** 2
        cand = cand_fn(pts, remaining, ring).withColumn(
            "dist2",
            (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
            + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy")),
        )
        # Guarantee-radius candidate prune (guide §2.3): only rows with
        # dist2 <= guarantee2 can participate in a RESOLUTION this
        # round, and the prune is exact — if >= k candidates lie within
        # the guarantee circle, the k nearest are all within it (they
        # are the k smallest distances), so the pruned top-k equals the
        # unpruned top-k and the query resolves identically; if fewer,
        # the pruned count drops below k and the query is unresolved —
        # exactly the verdict the unpruned round reaches (either < k
        # rows, or kth_d2 > guarantee2). Same inclusive <= as the
        # resolution check, same dist2 expression bit-for-bit.
        # Unresolved queries re-join at ring*4 from scratch, so pruned
        # rows never leak. Ring candidates outside the circle (corner
        # cells: ~1 - pi/4 of the box, plus the density margin) skip
        # the sort/shuffle/window entirely — measured 18-21% off the
        # round action at 1.44M points x 160k queries.
        cand = cand.filter(F.col("dist2") <= F.lit(guarantee2))
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "doc_id", "rank", "dist2")
        ).persist()
        round_caches.append(topk)
        resolved = (
            topk.groupBy("q_id")
            .agg(F.count(F.lit(1)).alias("n_found"), F.max("dist2").alias("kth_d2"))
            .filter((F.col("n_found") >= k) & (F.col("kth_d2") <= guarantee2))
            .select("q_id")
        )
        nxt = remaining.join(F.broadcast(resolved), "q_id", "left_anti")
        if nxt.count() == 0:  # the action that populates topk's cache
            for p in pts_persists:  # topk is cached; pts scan is done
                p.unpersist()
            if done is None:
                # single-round fast path: every query resolved, so the
                # cached round-1 top-k IS the result (documented single
                # persist residue, same as _finalize_rounds')
                return topk
            final = done.unionAll(
                topk.join(F.broadcast(resolved), "q_id", "left_semi")
            )
            return _finalize_rounds(final, round_caches)
        done_r = topk.join(F.broadcast(resolved), "q_id", "left_semi")
        done = done_r if done is None else done.unionAll(done_r)
        remaining = nxt
        ring *= 4

    leftover = knn_brute(
        brute_pts,
        remaining.select("q_id", F.col("qx").alias("x"), F.col("qy").alias("y")),
        k,
    )
    final = leftover if done is None else done.unionAll(leftover)
    return _finalize_rounds(final, round_caches + list(pts_persists))


def knn_ring(points: DataFrame, queries: DataFrame, zoom: int, grid_bits: int,
             k: int = 5, initial_ring: int | None = None,
             repartition_to: int | None = None,
             max_ring_rounds: int = 3,
             cell_join: str = "broadcast",
             cache_inputs: bool = True) -> DataFrame:
    """J6 scale path: iterative ring join on the cell grid, exact brute
    fallback only for queries no ring round resolves.

    Each round joins points whose cell lies within Chebyshev radius R
    of a query's cell, refines by exact distance, and takes the
    per-query top-k. A query is FINAL when its k-th distance ≤
    R * cell_size (nothing outside the ring can be closer — the same
    buffered-margin geometry as the reference's partitions,
    dem2tintiles_workflow.cpp:51-53). The first ring is
    density-derived (_density_ring) so round 1 is expected to resolve
    everything; the iterative loop is the rare-miss path. See
    _knn_rounds for the coordination contract.

    cell_join picks the candidate-join physical shape:
      "broadcast" (default): broadcast the query set and range-join on
        the cell box — NO shuffle of the big side, the right plan when
        the query set is driver-small (the common lookup case).
      "shuffle": explode each query's (2R+1)² cell box to rows and
        hash equi-join on (cell_x, cell_y) WITHOUT broadcast — the
        many-query plan (10^6+ queries would otherwise evaluate every
        box predicate against every point row); both sides shuffle on
        the cell key, partial work scales with |q|·ball + |points|.
    Both shapes are exact and hash-equal to knn_brute (tested).

    cache_inputs (default True) persists the points/queries
    projections for the DURATION OF THE CALL (released by the same
    unpersist pass as the per-round caches): the points side is read
    by the density aggregate AND by every ring round, the query side
    by every round's ball build — without the cache an expensive
    upstream subtree (a geocode chain, a replicated corpus) re-executes
    per consumer. Callers whose points side is too large to cache
    (10^12-row cluster scans, where two streaming passes beat one
    materialization) pass cache_inputs=False.
    """
    if cell_join not in ("broadcast", "shuffle"):
        raise ValueError(f"cell_join must be broadcast|shuffle, not {cell_join!r}")
    cell_m = GX.tile_size_meters(zoom + grid_bits)
    pts = points.select("doc_id", "x", "y", "cell_x", "cell_y")
    # No .rdd probing (that forces an RDD conversion) and no implicit
    # shuffle of the big side: callers with single-file local inputs
    # opt in via repartition_to (the query layer passes the session
    # default parallelism); cluster-scale inputs keep their layout.
    if repartition_to is not None:
        pts = pts.repartition(repartition_to)
    q = queries.select(
        "q_id",
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
        F.col("cell_x").alias("qcx"),
        F.col("cell_y").alias("qcy"),
    )
    persists: tuple = ()
    if cache_inputs:
        pts = pts.persist()
        q = q.persist()
        persists = (pts, q)

    if initial_ring is None:
        initial_ring = _density_ring(pts, k, cell_m, "square")
        if initial_ring is None:  # tiny/degenerate corpus: brute IS the plan
            out = knn_brute(
                pts, q.select("q_id", F.col("qx").alias("x"), F.col("qy").alias("y")), k
            )
            return _finalize_rounds(out, list(persists))

    def cand_fn(pts_r, remaining, ring):
        if cell_join == "shuffle":
            r = F.lit(ring)
            ball = (
                remaining.withColumn(
                    "cell_x", F.explode(F.sequence(F.col("qcx") - r, F.col("qcx") + r))
                )
                .withColumn(
                    "cell_y", F.explode(F.sequence(F.col("qcy") - r, F.col("qcy") + r))
                )
                .select("q_id", "qx", "qy", "cell_x", "cell_y")
            )
            # pin the declared physical shape: both sides shuffle on
            # the cell key. Without the hint the planner auto-broadcasts
            # any small-sample ball (sub-threshold at test scale),
            # silently turning the many-query plan back into the
            # broadcast plan it exists to avoid.
            return pts_r.join(ball.hint("SHUFFLE_HASH"), ["cell_x", "cell_y"], "inner")
        return pts_r.join(
            F.broadcast(remaining),
            (F.col("cell_x") >= F.col("qcx") - ring)
            & (F.col("cell_x") <= F.col("qcx") + ring)
            & (F.col("cell_y") >= F.col("qcy") - ring)
            & (F.col("cell_y") <= F.col("qcy") + ring),
            "inner",
        )

    return _knn_rounds(
        pts, q, k, initial_ring, max_ring_rounds,
        cand_fn, lambda r: r * cell_m, pts_persists=persists, brute_pts=pts,
    )


def _finalize_rounds(result: DataFrame, round_caches: list[DataFrame]) -> DataFrame:
    """Pin the (tiny: |queries| x k rows) final result, then release
    every per-round top-k cache — without this, repeated knn calls in a
    long-lived driver pin one cached DataFrame per ring round for the
    life of the session. The single result cache is the documented
    residue; callers that care run spark.catalog.clearCache() (bench.py
    does, between queries)."""
    result = result.persist()
    result.count()
    for c in round_caches:
        c.unpersist()
    return result


# unit CCW octagon (trig-free: exact double literals shared with the oracle)
_OCT_S = 0.7071067811865476
OCTAGON = [
    (1.0, 0.0), (_OCT_S, _OCT_S), (0.0, 1.0), (-_OCT_S, _OCT_S),
    (-1.0, 0.0), (-_OCT_S, -_OCT_S), (0.0, -1.0), (_OCT_S, -_OCT_S),
]


def convex_polygons_df(spark, n: int = 12, seed_base: int = 4242):
    """Deterministic convex polygons (scaled octagons) as edge rows:
    (poly_id, edge_id, ex1, ey1, ex2, ey2, pmin_x/pmax_x/pmin_y/pmax_y).
    Edge rows instead of ring arrays keep the exact point-in-convex
    test a plain join + min-cross aggregation (no UDF)."""
    from pyspark.sql import functions as F

    r = spark.range(n).withColumnRenamed("id", "poly_id")
    cx = GX.mercator_x_sql(f"(poly_id + {seed_base})")
    cy = GX.mercator_y_sql(f"(poly_id + {seed_base})")
    rad = f"({GX.dlit(200000.0)} + {GX.dlit(2000000.0)} * {GX.u_hash_sql(f'(poly_id + {seed_base})', 'u3')})"
    base = (
        r.withColumn("cx", F.expr(cx))
        .withColumn("cy", F.expr(cy))
        .withColumn("rad", F.expr(rad))
    )
    edges = None
    for i in range(len(OCTAGON)):
        x1, y1 = OCTAGON[i]
        x2, y2 = OCTAGON[(i + 1) % len(OCTAGON)]
        e = base.select(
            "poly_id",
            F.lit(i).alias("edge_id"),
            (F.col("cx") + F.col("rad") * x1).alias("ex1"),
            (F.col("cy") + F.col("rad") * y1).alias("ey1"),
            (F.col("cx") + F.col("rad") * x2).alias("ex2"),
            (F.col("cy") + F.col("rad") * y2).alias("ey2"),
            (F.col("cx") - F.col("rad")).alias("pmin_x"),
            (F.col("cx") + F.col("rad")).alias("pmax_x"),
            (F.col("cy") - F.col("rad")).alias("pmin_y"),
            (F.col("cy") + F.col("rad")).alias("pmax_y"),
        )
        edges = e if edges is None else edges.unionAll(e)
    return edges


def convex_polygons_sql(n: int = 12, seed_base: int = 4242) -> str:
    cx = GX.mercator_x_sql(f"(poly_id + {seed_base})")
    cy = GX.mercator_y_sql(f"(poly_id + {seed_base})")
    rad = f"({GX.dlit(200000.0)} + {GX.dlit(2000000.0)} * {GX.u_hash_sql(f'(poly_id + {seed_base})', 'u3')})"
    corners = " UNION ALL ".join(
        f"SELECT {i} AS edge_id, {GX.dlit(x1)} AS ox1, {GX.dlit(y1)} AS oy1, "
        f"{GX.dlit(OCTAGON[(i + 1) % 8][0])} AS ox2, {GX.dlit(OCTAGON[(i + 1) % 8][1])} AS oy2"
        for i, (x1, y1) in enumerate(OCTAGON)
    )
    return f"""
      SELECT poly_id, edge_id,
             cx + rad * ox1 AS ex1, cy + rad * oy1 AS ey1,
             cx + rad * ox2 AS ex2, cy + rad * oy2 AS ey2,
             cx - rad AS pmin_x, cx + rad AS pmax_x,
             cy - rad AS pmin_y, cy + rad AS pmax_y
      FROM (SELECT CAST(range AS BIGINT) AS poly_id, {cx} AS cx, {cy} AS cy, {rad} AS rad
            FROM range({n})), ({corners})
    """


def pip_convex_join(points: DataFrame, poly_edges: DataFrame) -> DataFrame:
    """Exact point-in-convex-polygon: a point is inside (boundary
    inclusive, matching F3's inclusive rule) iff the cross product
    against every CCW edge is >= 0 — join on the bbox prefilter, then
    min-cross >= 0 via group-by-having. Pure Column math."""
    j = points.join(
        F.broadcast(poly_edges),
        F.col("x").between(F.col("pmin_x"), F.col("pmax_x"))
        & F.col("y").between(F.col("pmin_y"), F.col("pmax_y")),
        "inner",
    ).withColumn(
        "cross",
        (F.col("ex2") - F.col("ex1")) * (F.col("y") - F.col("ey1"))
        - (F.col("ey2") - F.col("ey1")) * (F.col("x") - F.col("ex1")),
    )
    return (
        j.groupBy("poly_id", "doc_id")
        .agg(F.min("cross").alias("min_cross"), F.count(F.lit(1)).alias("n_edges"))
        .filter((F.col("min_cross") >= 0) & (F.col("n_edges") == 8))
        .select("poly_id", "doc_id")
    )


def _hex_ring_cells(remaining: DataFrame, ring: int) -> DataFrame:
    """Enumerate the hex BALL of radius `ring` around each query cell
    as rows — 3R(R+1)+1 cells per query (the axial-coordinate identity:
    hexdist <= R  ⟺  dq in [-R,R], dr in [max(-R,-dq-R), min(R,-dq+R)]).
    Turns the ring lookup into a broadcast HASH equi-join on (hex_q,
    hex_r) — at 10^12 points every point row probes a hash table once,
    instead of evaluating a hex-distance predicate against every query
    (BroadcastNestedLoopJoin, the plan the theta-join form compiles
    to)."""
    r = F.lit(ring)
    return (
        remaining.withColumn("dq", F.explode(F.sequence(-r, r)))
        .withColumn(
            "dr",
            F.explode(
                F.sequence(
                    F.greatest(-r, -F.col("dq") - r),
                    F.least(r, -F.col("dq") + r),
                )
            ),
        )
        .select(
            "q_id", "qx", "qy", "qhq", "qhr",
            (F.col("qhq") + F.col("dq")).alias("hex_q"),
            (F.col("qhr") + F.col("dr")).alias("hex_r"),
        )
    )


def knn_hex(points: DataFrame, queries: DataFrame, hex_size: float,
            k: int = 5, initial_ring: int | None = None,
            repartition_to: int | None = None,
            max_ring_rounds: int = 3,
            cell_join: str = "broadcast") -> DataFrame:
    """J6 over the H3-style hex index (charter: "kNN lookups over H3
    ring expansion"): same iterative driver as knn_ring (_knn_rounds),
    but candidate rings are hexagonal — the ring ball is exploded to
    cell rows and equi-joined on (hex_q, hex_r) — and the resolution
    guarantee uses the hex staircase geometry
    (hexgrid.hex_ring_guarantee_m). Cells are computed from the meter
    coordinates with pure Column expressions (no UDF, no native lib),
    ONCE: on the local/query path (repartition_to set) the hexed
    points projection is persisted across rounds instead of re-derived
    per action; cluster-scale callers keep their layout and pay the
    (cheap, codegen'd) per-scan hex math instead of caching 10^12
    rows. The first ring is density-derived so round 1 is expected to
    resolve everything. Exactness: results are hash-equal to knn_brute
    (the driver gate's oracle recomputes brute-force kNN in DuckDB).
    cell_join as in knn_ring: "broadcast" (default, driver-small query
    sets) or "shuffle" (many-query: the exploded ring ball equi-joins
    with no broadcast; both sides shuffle on the hex cell key)."""
    from ..functions import hexgrid as HG

    if cell_join not in ("broadcast", "shuffle"):
        raise ValueError(f"cell_join must be broadcast|shuffle, not {cell_join!r}")

    pts = points.select("doc_id", "x", "y")
    persists: tuple = ()
    if repartition_to is not None:
        pts = HG.with_hex_cell(pts.repartition(repartition_to), hex_size).persist()
        persists = (pts,)
    else:
        pts = HG.with_hex_cell(pts, hex_size)
    # the query side is small by contract and read by every round's
    # ball build — cache it for the call like knn_ring's cache_inputs
    q = HG.with_hex_cell(
        queries.select("q_id", F.col("x").alias("qx"), F.col("y").alias("qy")),
        hex_size, x="qx", y="qy", q_col="qhq", r_col="qhr",
    ).persist()
    persists = persists + (q,)

    if initial_ring is None:
        initial_ring = _density_ring(pts, k, hex_size, "hex")
        if initial_ring is None:  # tiny/degenerate corpus: brute IS the plan
            for p in persists:
                p.unpersist()
            return knn_brute(
                pts, q.select("q_id", F.col("qx").alias("x"), F.col("qy").alias("y")), k
            )

    def cand_fn(pts_r, remaining, ring):
        ball = _hex_ring_cells(remaining, ring)
        # the ball has 3R(R+1)+1 rows PER QUERY and R is density-derived
        # (unbounded on sparse corpora, x4 per miss round): past the cap
        # drop the broadcast hint and let the equi-join shuffle instead
        # of forcing an arbitrarily large broadcast through the driver
        if cell_join == "broadcast" and 3 * ring * (ring + 1) + 1 <= 8192:
            ball = F.broadcast(ball)
        return pts_r.join(ball, ["hex_q", "hex_r"], "inner")

    return _knn_rounds(
        pts, q, k, initial_ring, max_ring_rounds,
        cand_fn, lambda r: HG.hex_ring_guarantee_m(r, hex_size),
        pts_persists=persists, brute_pts=pts,
    )
