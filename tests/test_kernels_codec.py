"""Quantized-mesh codec goldens.

Zig-zag vectors from the reference test
(/root/reference/test/src/QuantizedMeshIO_tests.cpp:15-59) and
write→read round-trip preserving face count (:62-115)."""

import numpy as np

from tin_terrain_spark.kernels import codec as C


def test_zig_zag_golden_vectors():
    pairs = [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4), (-32768, 65535), (32767, 65534)]
    for value, encoded in pairs:
        assert int(C.zig_zag_encode(np.int16(value))) == encoded
        assert int(C.zig_zag_decode(np.uint16(encoded))) == value


def test_zig_zag_roundtrip_all_int16():
    vals = np.arange(-32768, 32768, dtype=np.int16)
    np.testing.assert_array_equal(C.zig_zag_decode(C.zig_zag_encode(vals)), vals)


def test_scale_quantize():
    assert int(C.scale_coordinate(0.0)) == 0
    assert int(C.scale_coordinate(1.0)) == 32767
    assert int(C.quantize_coordinate(5.0, 0.0, 10.0)) == 16383  # truncation
    assert abs(float(C.dequantize_coordinate(16383, 0.0, 10.0)) - 5.0) < 1e-3


def test_high_watermark_roundtrip():
    idx = np.array([0, 1, 2, 0, 2, 3, 1, 4, 2], dtype=np.int64)
    enc = C.high_watermark_encode(idx)
    np.testing.assert_array_equal(C.high_watermark_decode(enc), idx)
    # first-ever index must be 0 and encode to delta 0
    assert enc[0] == 0


def test_qm_tile_roundtrip():
    # two triangles forming the unit square, already tile-space [0,1]
    tris = np.array(
        [
            [[0.0, 0.0, 0.1], [1.0, 0.0, 0.4], [1.0, 1.0, 0.9]],
            [[0.0, 0.0, 0.1], [1.0, 1.0, 0.9], [0.0, 1.0, 0.2]],
        ]
    )
    blob = C.encode_qm_tile(tris, (0.0, 0.0, 0.1), (1.0, 1.0, 0.9), mesh_is_rescaled=True)
    tile = C.decode_qm_tile(blob)
    assert len(tile.faces) == 2
    assert len(tile.u) == 4  # deduped vertices
    # faces reference valid vertices
    assert tile.faces.max() < 4
    # edge lists: corners (0,0) and (1,1) present
    assert 0 in tile.u and 32767 in tile.u
    # header min/max heights
    assert abs(tile.min_height - 0.1) < 1e-6
    assert abs(tile.max_height - 0.9) < 1e-6


def test_qm_tile_quantized_path():
    tris = np.array(
        [
            [[10.0, 20.0, 100.0], [14.0, 20.0, 140.0], [14.0, 24.0, 190.0]],
        ]
    )
    blob = C.encode_qm_tile(tris, (10.0, 20.0, 100.0), (14.0, 24.0, 190.0))
    tile = C.decode_qm_tile(blob)
    assert len(tile.faces) == 1
    # dequantize and compare coordinates
    x = C.dequantize_coordinate(tile.u, 10.0, 14.0)
    np.testing.assert_allclose(sorted(x), [10.0, 14.0, 14.0], atol=2e-4 * 4)


def test_ecef_known_point():
    # lon=0, lat=0 → ECEF (a, 0, 0)
    x, y, z = C.mercator_to_ecef(0.0, 0.0, 0.0)
    assert abs(x - 6378137.0) < 1e-6
    assert abs(y) < 1e-6
    assert abs(z) < 1e-6


def test_row_unique3_matches_np_unique():
    rng = np.random.RandomState(11)
    for n, dup in ((1, 1), (7, 3), (500, 60), (3100, 900)):
        base = rng.rand(max(dup, 1), 3)
        a = base[rng.randint(0, len(base), n)]
        # exercise -0.0 == 0.0 numeric semantics too
        a[rng.rand(n) < 0.1] = 0.0
        a[rng.rand(n) < 0.05] = -0.0
        u1, i1, inv1 = np.unique(a, axis=0, return_index=True, return_inverse=True)
        u2, i2, inv2 = C._row_unique3(a)
        assert np.array_equal(u1, u2)
        assert np.array_equal(i1, i2)
        assert np.array_equal(np.asarray(inv1).ravel(), inv2)


def test_watermark_first_seen_fast_path_matches_loop():
    rng = np.random.RandomState(5)
    for n in (0, 1, 9, 3000):
        soup = rng.rand(max(n // 3, 1), 3, 3)[: max(n // 3, 0)]
        stream = C._first_seen_vertex_order(soup.reshape(-1, 3))[1] if len(soup) else np.zeros(0, dtype=np.int64)
        fast = C._watermark_encode_first_seen(np.asarray(stream, dtype=np.int64))
        slow = C.high_watermark_encode(stream)
        assert np.array_equal(fast, slow)
        # and the roundtrip still holds
        assert np.array_equal(C.high_watermark_decode(fast), stream)
