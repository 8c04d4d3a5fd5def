"""Spark-level integration tests (local[8], sf0.001). Marked as one
module so the session is built once."""

import os

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from tin_terrain_spark.session import get_spark

    s = get_spark("it", cores=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def points(spark):
    from tin_terrain_spark.operators.geocode import geocode_points

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return geocode_points(docs, zoom=2, grid_bits=5).cache()


def test_geocode_in_range(points):
    from tin_terrain_spark.functions.geocode_exprs import HALF_CIRCUMFERENCE

    import pyspark.sql.functions as F

    row = points.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y"), F.min("tile_x"), F.max("tile_x")
    ).collect()[0]
    assert row[0] >= -HALF_CIRCUMFERENCE and row[1] <= HALF_CIRCUMFERENCE
    assert row[4] >= 0 and row[5] <= 3  # zoom 2 → 4 tiles per side


def test_tile_key_matches_numpy_kernel(points):
    """Column-expression tile keys == NumPy kernel tile keys (the two
    implementations must agree bit-for-bit)."""
    from tin_terrain_spark.kernels import mercator as M

    pdf = points.select("x", "y", "tile_x", "tile_y").toPandas()
    tx, ty = M.meters_to_tile(pdf["x"].to_numpy(), pdf["y"].to_numpy(), 2)
    np.testing.assert_array_equal(tx, pdf["tile_x"].to_numpy())
    np.testing.assert_array_equal(ty, pdf["tile_y"].to_numpy())


def test_mesh_tiles_terra(points):
    from tin_terrain_spark.kernels.codec import decode_qm_tile
    from tin_terrain_spark.operators.meshing import mesh_tiles

    rows = mesh_tiles(points, zoom=2, method="terra", max_error=2.0).collect()
    assert len(rows) == 16
    for r in rows:
        assert r["n_faces"] > 0
        assert r["terrain"] is not None
        t = decode_qm_tile(bytes(r["terrain"]))
        assert len(t.faces) == r["n_faces"]
        assert len(t.u) == r["n_vertices"]
        assert (t.faces < len(t.u)).all()


def test_mesh_error_bound(points):
    """Per-tile max geometric error ≤ max_error + interpolation slack
    (the reference's benchmark oracle, SURVEY §3.3)."""
    from tin_terrain_spark.operators.meshing import mesh_tiles

    rows = (
        mesh_tiles(points, zoom=2, method="terra", max_error=2.0, compute_error=True)
        .select("max_err", "n_points")
        .collect()
    )
    errs = [
        r["max_err"]
        for r in rows
        if r["max_err"] is not None and not np.isnan(r["max_err"]) and r["n_points"] > 10
    ]
    assert errs
    # Terra's bound applies to cells its scanlines visit; on SPARSE
    # rasters isolated cells can sit outside every triangle's scan
    # (the reference behaves identically — its benchmarks use dense
    # DEMs). Require the bound+interp-slack on ≥75% of tiles and a hard
    # sanity ceiling on the rest.
    within = [e for e in errs if e <= 2.0 + 6.0]
    assert len(within) >= 0.75 * len(errs), sorted(errs)[-3:]
    assert max(errs) < 50.0, max(errs)


def test_knn_ring_equals_brute(spark, points):
    import pyspark.sql.functions as F

    from tin_terrain_spark.operators.joins import knn_brute, knn_ring

    queries = points.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("q_id"), "x", "y", "cell_x", "cell_y"
    )
    others = points.filter(F.col("doc_id") >= 10)
    b = {
        (r["q_id"], r["rank"]): r["doc_id"]
        for r in knn_brute(others, queries, k=5).collect()
    }
    g = {
        (r["q_id"], r["rank"]): r["doc_id"]
        for r in knn_ring(others, queries, 2, 5, k=5, initial_ring=2).collect()
    }
    assert b == g


def test_knn_density_ring_equals_brute(spark, points):
    """initial_ring=None → density-derived first ring (or the brute
    short-circuit on tiny corpora); all three variants must agree."""
    import pyspark.sql.functions as F

    from tin_terrain_spark.functions.geocode_exprs import tile_size_meters
    from tin_terrain_spark.operators.joins import knn_brute, knn_hex, knn_ring

    queries = points.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("q_id"), "x", "y", "cell_x", "cell_y"
    )
    others = points.filter(F.col("doc_id") >= 10)
    b = {
        (r["q_id"], r["rank"]): r["doc_id"]
        for r in knn_brute(others, queries, k=5).collect()
    }
    g = {
        (r["q_id"], r["rank"]): r["doc_id"]
        for r in knn_ring(others, queries, 2, 5, k=5).collect()
    }
    assert b == g
    h = {
        (r["q_id"], r["rank"]): r["doc_id"]
        for r in knn_hex(
            others, queries.select("q_id", "x", "y"), tile_size_meters(7), k=5
        ).collect()
    }
    assert b == h
    # explicit small first ring → the iterative path still converges
    h2 = {
        (r["q_id"], r["rank"]): r["doc_id"]
        for r in knn_hex(
            others, queries.select("q_id", "x", "y"), tile_size_meters(7), k=5,
            initial_ring=1,
        ).collect()
    }
    assert b == h2
    # the many-query shuffled cell equi-join shape is exact too
    s = {
        (r["q_id"], r["rank"]): r["doc_id"]
        for r in knn_ring(others, queries, 2, 5, k=5, cell_join="shuffle").collect()
    }
    assert b == s
    sh = {
        (r["q_id"], r["rank"]): r["doc_id"]
        for r in knn_hex(
            others, queries.select("q_id", "x", "y"), tile_size_meters(7), k=5,
            cell_join="shuffle",
        ).collect()
    }
    assert b == sh


def test_with_h3_id_packs_axial(spark, points):
    """H3-layout ids over the hex grid: every packed id must be a valid
    cell-mode H3 index that decodes back to its row's axial cell."""
    import pyspark.sql.functions as F

    from tin_terrain_spark.functions.geocode_exprs import tile_size_meters
    from tin_terrain_spark.functions.h3pack import (
        SHIM_BASE_CELL, axial_from_h3, h3_is_valid, unpack_h3, with_h3_id,
    )

    rows = (
        with_h3_id(
            points.select("doc_id", "x", "y").filter(F.col("doc_id") < 100),
            tile_size_meters(7),
        )
        .select("hex_q", "hex_r", "h3_id")
        .collect()
    )
    assert len(rows) == 100
    for r in rows:
        h = r["h3_id"] & 0xFFFFFFFFFFFFFFFF  # BIGINT carrier -> uint64 bits
        assert h3_is_valid(h)
        f = unpack_h3(h)
        assert f["res"] == 10 and f["base_cell"] == SHIM_BASE_CELL
        assert axial_from_h3(h) == (r["hex_q"], r["hex_r"])


def test_image_features_real_png_path(spark):
    """PNG payloads run the REAL decoder through the full mapInPandas
    pipeline: pooled features equal the hand-computed column sums of
    the decoded grayscale pixels (not the stub's hash pixels)."""
    import numpy as np

    from tin_terrain_spark.kernels import png as P
    from tin_terrain_spark.operators import multimodal as M
    from tin_terrain_spark.operators.multimodal import image_features

    px = np.tile((np.arange(32, dtype=np.uint8) * 7)[None, :, None], (32, 1, 1))
    payload = P.encode_png(px, filters=4)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), 32, 32)],
        "doc_id long, media_type string, payload binary, width int, height int",
    )
    feat = image_features(media).collect()[0]["feature"]
    if not M._HAS_PIL:
        gray = (px[:, :, 0].astype(np.float32)) / 256.0
        expect = gray.sum(axis=0, dtype=np.float64)[:16].astype(np.float32)
        assert feat == pytest.approx(list(expect))
    else:
        assert len(feat) == 16


def test_ann_lsh_recall(spark):
    from tin_terrain_spark.operators.similarity import ann_brute, ann_lsh

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = ann_brute(emb, n_queries=8, k=10).collect()
    approx = ann_lsh(emb, n_queries=8, k=10).collect()
    exact_set = {(r["q_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["q_id"], r["vec_id"]) for r in approx}
    # sign-random-projection buckets keep a meaningful share of true
    # neighbors (64-dim random data is a worst case for LSH)
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.1, recall
    # and every returned candidate scores correctly (subset property):
    # approx scores must exist in the exact ranking with equal score
    exact_scores = {(r["q_id"], r["vec_id"]): r["score"] for r in exact}
    for r in approx:
        k = (r["q_id"], r["vec_id"])
        if k in exact_scores:
            assert abs(exact_scores[k] - r["score"]) < 1e-9


def test_pipeline_resume(spark, tmp_path):
    from tin_terrain_spark.pipeline.dem2tintiles import build_tile_pyramid, read_manifest

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "tiles")
    m1 = build_tile_pyramid(spark, docs, out, min_zoom=1, max_zoom=2, method="dense")
    assert set(m1.keys()) == {1, 2}
    secs_first = {z: m1[z]["seconds"] for z in m1}
    # resume: nothing recomputed (manifest + _SUCCESS present)
    m2 = build_tile_pyramid(spark, docs, out, min_zoom=1, max_zoom=2, method="dense")
    assert {z: m2[z]["seconds"] for z in m2} == secs_first
    # tiles written and readable, partitioned per zoom
    t1 = spark.read.parquet(f"{out}/zoom=1")
    assert t1.count() == m1[1]["n_tiles"]
    assert read_manifest(out)[2]["n_tiles"] == m1[2]["n_tiles"]


def test_connected_components_transitive(spark):
    """CC over pairs: A~B~C one cluster WITHOUT an A~C edge; chains,
    a long path (pointer-jump convergence), and isolated pairs."""
    from tin_terrain_spark.operators.dedup import connected_components

    # components: {1,2,3} (path), {10,11} (edge), {20..29} (long chain)
    chain = [(i, i + 1) for i in range(20, 29)]
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)] + chain, "doc_a long, doc_b long"
    )
    rows = connected_components(pairs).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in rows}
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
    assert got[10] == (10, 2) and got[11] == (10, 2)
    for v in range(20, 30):
        assert got[v] == (20, 10), v
    assert len(got) == 15


def test_pipeline_catalog_tile_resume(spark, tmp_path):
    """Pipeline sink through the TileCatalog: resume is TILE-granular —
    pre-merged keys are anti-joined out of the work grid and NOT
    recomputed (their rows survive untouched), missing tiles are
    meshed and merged in."""
    import pyspark.sql.functions as F

    from tin_terrain_spark.pipeline.dem2tintiles import build_tile_pyramid
    from tin_terrain_spark.sources.iceberg import LocalTileCatalog

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # full build through the catalog
    cat = LocalTileCatalog(spark, str(tmp_path / "cat"))
    m = build_tile_pyramid(
        spark, docs, str(tmp_path / "o1"), min_zoom=2, max_zoom=2,
        method="dense", catalog=cat,
    )
    full = cat.read().where("zoom = 2")
    n_full = full.count()
    assert n_full == m[2]["n_tiles"] > 4

    # new catalog pre-seeded with a sentinel row for one real tile key:
    # the pipeline must SKIP that tile (anti-join), so the sentinel
    # survives and every other tile matches the full build
    k = full.select("tile_x", "tile_y").orderBy("tile_x", "tile_y").first()
    cat2 = LocalTileCatalog(spark, str(tmp_path / "cat2"))
    sentinel = (
        full.filter(
            (F.col("tile_x") == k["tile_x"]) & (F.col("tile_y") == k["tile_y"])
        )
        .withColumn("n_points", F.lit(-777).cast("long"))
    )
    cat2.merge(sentinel)
    build_tile_pyramid(
        spark, docs, str(tmp_path / "o2"), min_zoom=2, max_zoom=2,
        method="dense", catalog=cat2,
    )
    got = cat2.read().where("zoom = 2")
    assert got.count() == n_full
    kept = got.filter(
        (F.col("tile_x") == k["tile_x"]) & (F.col("tile_y") == k["tile_y"])
    ).first()
    assert kept["n_points"] == -777  # skipped, not recomputed


def test_asc_xyz_spark_sources(spark, tmp_path):
    """ASC and XYZ granules ingest distributed (binaryFile → cells) and
    feed the same tile pipeline as GeoTIFF."""
    import numpy as np

    from tin_terrain_spark.kernels.meshio import format_asc
    from tin_terrain_spark.kernels.raster import Grid
    from tin_terrain_spark.operators.meshing import mesh_tiles
    from tin_terrain_spark.sources.geotiff import assign_tile_keys
    from tin_terrain_spark.sources.textgrids import asc_cells, xyz_cells

    rng = np.random.RandomState(4)
    z = rng.rand(8, 8) * 50
    z[0, 0] = -99999.0  # nodata dropped at source
    g = Grid(z.copy(), xpos=100.0, ypos=200.0, cellsize=10.0, ndv=-99999.0)
    (tmp_path / "a.asc").write_text(format_asc(g))
    cells = asc_cells(spark, str(tmp_path / "a.asc"))
    rows = cells.collect()
    assert len(rows) == 63  # 64 - nodata
    assert all(r["z"] != -99999.0 for r in rows)

    (tmp_path / "p.xyz").write_text(
        "1 2 3\n4 5 6\nbad line\n7 8 99999\n10 11 12\n"
    )
    pts = xyz_cells(spark, str(tmp_path / "p.xyz"))
    got = sorted((r["x"], r["y"], r["z"]) for r in pts.collect())
    assert got == [(1.0, 2.0, 3.0), (4.0, 5.0, 6.0), (10.0, 11.0, 12.0)]

    # e2e: keys + mesh on the asc cells (world coords are tiny, all in
    # one tile at zoom 0)
    keyed = assign_tile_keys(cells, zoom=0, grid_bits=3)
    tiles = mesh_tiles(keyed, zoom=0, grid_bits=3, method="dense", step=2,
                       buffer_cells=0)
    t = tiles.collect()
    assert len(t) >= 1 and all(r["n_faces"] > 0 for r in t)


def test_streaming_windowed_counts(spark):
    from tin_terrain_spark.streaming.events import stream_windowed_counts

    agg = stream_windowed_counts(spark, SF)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM win_counts")
        n = out.count()
        assert n > 0
        # batch mirror must agree on total event count
        total_stream = out.agg({"n": "sum"}).collect()[0][0]
        total_batch = spark.read.parquet(f"{SF}/events.parquet").count()
        assert total_stream == total_batch
    finally:
        q.stop()


def test_streaming_tile_ingest(spark):
    from tin_terrain_spark.streaming.events import stream_tile_ingest

    df = stream_tile_ingest(spark, SF, zoom=3)
    q = df.writeStream.outputMode("append").format("memory").queryName("ingest").start()
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM ingest")
        assert out.count() == 500
        # identical to the batch geocode
        from tin_terrain_spark.operators.geocode import geocode_points

        batch = geocode_points(
            spark.read.parquet(f"{SF}/documents.parquet"), zoom=3
        ).select("doc_id", "tile_x", "tile_y")
        assert (
            out.select("doc_id", "tile_x", "tile_y")
            .exceptAll(batch)
            .isEmpty()
        )
    finally:
        q.stop()


def test_golden_tile_counts(spark, points):
    """Frozen golden per-tile counts at sf0.001 zoom 2 (FIXTURES.md §4
    tiles_golden): any change to geocoding, gridding, buffering, or the
    mesh kernels that shifts tile assignment or mesh size trips this."""
    import json
    import os

    from tin_terrain_spark.operators.meshing import mesh_tiles

    with open(os.path.join(os.path.dirname(__file__), "golden_tiles_sf0001_z2.json")) as f:
        golden = json.load(f)
    for method, kw in [
        ("terra", {"max_error": 2.0}),
        ("zemlya", {"max_error": 2.0}),
        ("dense", {"step": 2, "buffer_cells": 0}),
    ]:
        rows = (
            mesh_tiles(points, zoom=2, grid_bits=5, method=method, **kw)
            .select("tile_x", "tile_y", "n_points", "n_vertices", "n_faces")
            .collect()
        )
        got = sorted([[r[0], r[1], r[2], r[3], r[4]] for r in rows])
        assert got == golden[method], f"{method} golden mismatch"


def test_streaming_stateful_sessionize(spark):
    """applyInPandasWithState sessionizer: replaying the whole events
    table in one micro-batch must produce the same (user, n_events,
    sum_value) session multiset as the batch lag/cumsum sessionizer."""
    from tin_terrain_spark.queries_ext import q_sessionize
    from tin_terrain_spark.streaming.sessionize import stream_sessionize

    out = stream_sessionize(spark, SF)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_state")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT user_id, n_events, round(sum_value, 6) AS sv FROM sess_state"
        ).collect()
    finally:
        q.stop()
    stream_sessions = sorted((r["user_id"], r["n_events"], r["sv"]) for r in got)
    batch = q_sessionize(spark, SF).collect()
    batch_sessions = sorted(
        (r["user_id"], r["n_events"], r["sum_value"]) for r in batch
    )
    assert stream_sessions == batch_sessions


def test_ann_ivf_recall(spark):
    from tin_terrain_spark.operators.similarity import ann_brute, ann_ivf

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = ann_brute(emb, n_queries=8, k=10).collect()
    approx = ann_ivf(emb, n_queries=8, k=10).collect()
    exact_set = {(r["q_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["q_id"], r["vec_id"]) for r in approx}
    # probing 4 of 16 inverted lists scans ~25% of the corpus but the
    # lists are locality-clustered: recall must beat the scan fraction
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, recall
    # scores of returned candidates match the exact ranking
    exact_scores = {(r["q_id"], r["vec_id"]): r["score"] for r in exact}
    for r in approx:
        key = (r["q_id"], r["vec_id"])
        if key in exact_scores:
            assert abs(r["score"] - exact_scores[key]) < 1e-9


def test_lsh_hot_bucket_star(spark):
    """A degenerate bucket (identical boilerplate docs > bucket_cap)
    must still connect the whole cluster — as a hub star (O(bucket)
    pairs), never O(n²), and never dropped."""
    from tin_terrain_spark.operators.dedup import lsh_candidates

    n_hot = 30
    rows = [(i, "the same boilerplate page text repeated verbatim here") for i in range(n_hot)]
    rows += [(100 + i, f"unique document number {i} with its own words entirely") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    pairs = lsh_candidates(docs, bucket_cap=10).collect()
    hot = [(p.doc_a, p.doc_b) for p in pairs if p.doc_a < 100 and p.doc_b < 100]
    # star: exactly n_hot-1 pairs, all anchored at the min id
    assert len(hot) == n_hot - 1
    assert all(a == 0 for a, _ in hot)
    assert sorted(b for _, b in hot) == list(range(1, n_hot))


def test_short_doc_shingles(spark):
    """Docs shorter than NGRAM tokens get a whole-doc shingle: verbatim
    short duplicates must reach near-dup output (jaccard 1.0)."""
    from tin_terrain_spark.operators.dedup import near_dup_pairs, shingles_df

    docs = spark.createDataFrame(
        [(1, "short doc"), (2, "short doc"), (3, "другой"), (4, "a much longer document with many words")],
        "doc_id BIGINT, text STRING",
    )
    sh = shingles_df(docs).collect()
    assert {r.doc_id for r in sh} == {1, 2, 3, 4}
    nd = near_dup_pairs(docs).collect()
    assert any(r.doc_a == 1 and r.doc_b == 2 and r.jaccard == 1.0 for r in nd)


def test_stream_kernel_equals_grouped_kernel(points):
    """The streaming mapInPandas mesh path (one Arrow round per batch
    of tiles) must produce byte-identical rows to the per-group
    applyInPandas path — terrain blobs included."""
    from tin_terrain_spark.operators.meshing import (
        TILE_SCHEMA, _make_mesh_kernel, cell_grid, mesh_tiles,
    )

    args = (2, 5, 2, "terra", 2.0, 1, True, True)
    new = {
        (r["tile_x"], r["tile_y"]): r.asDict()
        for r in mesh_tiles(points, zoom=2, method="terra", max_error=2.0,
                            compute_error=True).collect()
    }
    cells = cell_grid(points, zoom=2, grid_bits=5, buffer_cells=2)
    old = {
        (r["tile_x"], r["tile_y"]): r.asDict()
        for r in cells.groupBy("tile_x", "tile_y")
        .applyInPandas(_make_mesh_kernel(*args), TILE_SCHEMA)
        .collect()
    }
    assert set(new) == set(old) and len(new) == 16
    for k, nrow in new.items():
        orow = old[k]
        for col, v in nrow.items():
            ov = orow[col]
            if isinstance(v, float) and np.isnan(v):
                assert np.isnan(ov), (k, col)
            else:
                assert v == ov, (k, col)


def test_quality_filter_keep_is_boolean_for_tiny_docs(spark):
    """Docs with <2 tokens produce no bigrams; top_bigram_frac comes
    back NULL from rep_signals' left join. `keep` must still be a real
    boolean for every row, for ANY min_tokens — including <=1 where
    the length rule no longer masks the NULL via false AND NULL."""
    from tin_terrain_spark.operators.textops import quality_filter

    docs = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "a a a a a a a a a a")],
        "doc_id BIGINT, text STRING",
    )
    rows = {r.doc_id: r for r in quality_filter(docs, min_tokens=1).collect()}
    for did, r in rows.items():
        assert r.keep is not None, f"doc {did}: keep is NULL"
        assert r.ok_top_bigram is not None, f"doc {did}: ok_top_bigram is NULL"
    # the 1-token doc has no bigram repetition to object to
    assert rows[1].ok_top_bigram is True
    # doc 3 fails distinct/top-token rules but boolean-ly so
    assert rows[3].keep is False


def test_contamination_broadcast_optin_same_result(spark):
    """The broadcast hint on the benchmark side is opt-in (the default
    lets AQE size the join: a corpus-derived benchmark slice is NOT
    guaranteed tiny at scale). Both plans must agree on values."""
    from tin_terrain_spark.operators.dedup import contamination

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} alpha beta gamma delta epsilon tok{i % 5} zeta")
         for i in range(60)],
        "doc_id BIGINT, text STRING",
    )
    a = sorted(map(tuple, contamination(docs, bench_mod=10).collect()))
    b = sorted(map(tuple, contamination(docs, bench_mod=10,
                                        broadcast_bench=True).collect()))
    assert a == b and len(a) > 0


def test_connected_components_log_diameter_rounds(spark):
    """Pointer jumping bounds CC rounds by ~log2(diameter), not
    O(diameter): a 512-vertex chain (diameter 511) must converge in
    <= ceil(log2(511)) + 2 = 11 rounds (measured: 10), where plain
    min-label propagation would need ~511. A star must converge in 2
    (one propagate + one fixpoint confirm)."""
    import math

    from tin_terrain_spark.operators.dedup import connected_components

    n = 512
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a BIGINT, doc_b BIGINT"
    )
    st = {}
    out = connected_components(chain, stats=st).collect()
    assert len(out) == n
    assert all(r.cluster_id == 0 and r.cluster_size == n for r in out)
    assert 4 <= st["rounds"] <= math.ceil(math.log2(n - 1)) + 2

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 40)], "doc_a BIGINT, doc_b BIGINT"
    )
    st = {}
    out = connected_components(star, stats=st).collect()
    assert all(r.cluster_id == 0 and r.cluster_size == 40 for r in out)
    assert st["rounds"] == 2


def test_image_features_16bit_and_palette_png_path(spark):
    """16-bit grayscale and palette PNGs run the REAL decoder through
    the full mapInPandas pipeline (not the stub): features equal the
    hand-computed pooled sums of the decoded grayscale pixels."""
    import numpy as np

    from tin_terrain_spark.kernels import png as P
    from tin_terrain_spark.operators import multimodal as M
    from tin_terrain_spark.operators.multimodal import image_features

    if M._HAS_PIL:
        pytest.skip("PIL present: real-library path covered elsewhere")

    rng = np.random.RandomState(11)
    px16 = (rng.randint(0, 65536, size=(32, 32, 1))).astype(np.uint16)
    pal = rng.randint(0, 256, size=(23, 3)).astype(np.uint8)
    idx = rng.randint(0, 23, size=(32, 32)).astype(np.uint8)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(P.encode_png(px16, filters=2)), 32, 32),
            (2, "image", bytearray(P.encode_png_palette(idx, pal, filters=4)), 32, 32),
        ],
        "doc_id long, media_type string, payload binary, width int, height int",
    )
    feats = {r["doc_id"]: r["feature"] for r in image_features(media).collect()}

    g16 = px16[:, :, 0].astype(np.float32) / 65536.0
    exp16 = g16.sum(axis=0, dtype=np.float64)[:16].astype(np.float32)
    assert feats[1] == pytest.approx(list(exp16))

    rgb = pal[idx].astype(np.int64)
    gpal = ((rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
            ).astype(np.float32) / 256.0
    exppal = gpal.sum(axis=0, dtype=np.float64)[:16].astype(np.float32)
    assert feats[2] == pytest.approx(list(exppal))


def test_dedup_keep_semantics(spark):
    """dedup_keep contract on a hand-built corpus: cluster minima and
    singleton docs keep; transitive duplicates drop — A~B, B~C must
    drop BOTH B and C even though A~C is never a pair."""
    from tin_terrain_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a BIGINT, doc_b BIGINT"
    )
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 7, 9)],
                                 "doc_id BIGINT")
    from pyspark.sql import functions as F

    cc = connected_components(pairs).select("doc_id", "cluster_id")
    cid = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    out = {r.doc_id: (r.cluster_id, r.keep)
           for r in docs.join(cc, "doc_id", "left")
           .select("doc_id", cid.alias("cluster_id"),
                   (cid == F.col("doc_id")).alias("keep")).collect()}
    assert out == {1: (1, True), 2: (1, False), 3: (1, False),
                   5: (5, True), 7: (7, True), 9: (7, False)}


def test_lm_score_properties(spark):
    """Unigram surprisal: hand-checkable on a tiny corpus — a doc made
    of the corpus's most common token scores the fewest bits/token,
    rare-token docs the most, and the exact value matches the closed
    form for a known distribution."""
    import math

    import pyspark.sql.functions as F

    from tin_terrain_spark.operators.textops import lm_score

    docs = spark.createDataFrame(
        [
            (0, "aa aa aa aa"),          # 4x the common token
            (1, "aa aa bb bb"),          # mixed
            (2, "zz yy"),                # two singletons
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    # corpus: aa x6, bb x2, zz x1, yy x1 -> total 10
    assert out[0]["n_tokens"] == 4
    assert out[0]["bits_per_token"] == round(math.log2(10) - math.log2(6), 6)
    assert out[2]["bits_per_token"] == round(math.log2(10) - 0.0, 6)
    assert (
        out[0]["bits_per_token"]
        < out[1]["bits_per_token"]
        < out[2]["bits_per_token"]
    )


def test_kmv_distinct_sketch(spark):
    """Bottom-k sketch: groups under k distinct values report the
    exact count; a large group's estimate lands within the standard
    KMV error envelope (a deterministic fixture, so the assertion is
    stable, but the bound asserted is the published ~1/sqrt(k-2))."""
    import pyspark.sql.functions as F

    from tin_terrain_spark.operators.sketches import kmv_distinct

    small = [("s", f"v{i % 10}") for i in range(100)]      # 10 distinct
    big = [("b", f"value-{i}") for i in range(20000)]      # 20k distinct
    df = spark.createDataFrame(small + big, ["g", "v"])
    out = {r["g"]: r for r in kmv_distinct(df, "g", "v", k=64).collect()}
    assert out["s"]["n_exact"] == 10
    assert out["s"]["kmv_estimate"] == 10.0  # lossless below k
    est, exact = out["b"]["kmv_estimate"], out["b"]["n_exact"]
    assert exact == 20000
    assert abs(est - exact) / exact < 3.0 / (64 - 2) ** 0.5  # ~3 sigma


def test_span_dups_witnesses_shared_passage(spark):
    """Two docs sharing a long passage must share a fingerprint; a
    doc with no overlap must not appear."""
    import pyspark.sql.functions as F

    from tin_terrain_spark.operators.dedup import span_dups

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, "intro words " + shared + " tail zero"),
            (1, "other opening " + shared + " different ending"),
            (2, "completely unrelated text with many plain tokens here"),
        ],
        ["doc_id", "text"],
    )
    out = span_dups(docs).collect()
    assert out, "shared passage must produce at least one shared fp"
    docs_seen = set()
    for r in out:
        assert r["n_docs"] == 2
        docs_seen |= {r["first_doc"], r["last_doc"]}
    assert docs_seen == {0, 1}  # doc 2 never flagged
