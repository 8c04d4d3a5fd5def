"""Iceberg source gating (sources/iceberg.py).

This container has no Iceberg jars, so these tests pin the DEGRADE
path: availability probe is honest, every jar-requiring entry point
raises IcebergUnavailable with launch guidance, the parquet fallback
serves the same pages schema, and the DDL/MERGE SQL is well-formed
(parseable structure, bucket(url) layout, full tile-key join)."""

from __future__ import annotations

import pytest

from tin_terrain_spark.sources import iceberg as I

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from tin_terrain_spark.session import get_spark

    s = get_spark("iceberg_t", cores=4)
    yield s
    s.stop()


def test_availability_probe(spark):
    assert I.iceberg_available(spark) is False  # no jars in this image


def test_jarless_entry_points_raise(spark):
    with pytest.raises(I.IcebergUnavailable, match="--packages"):
        I.read_pages(spark)
    with pytest.raises(I.IcebergUnavailable):
        I.read_pages_incremental(spark, 1)
    with pytest.raises(I.IcebergUnavailable):
        I.completed_tile_keys(spark, zoom=4)
    with pytest.raises(I.IcebergUnavailable):
        I.merge_tiles(spark, spark.range(1))


def test_parquet_fallback_reads_pages_schema(spark):
    df = I.read_pages(spark, parquet_fallback=f"{SF}/documents.parquet")
    assert df.count() > 0


def test_ddl_shape():
    ddl = I.create_pages_table_ddl("lake.web.pages")
    assert f"bucket({I.N_BUCKETS}, url)" in ddl
    assert "days(warc_ts)" in ddl
    assert "USING iceberg" in ddl
    for col in ("url STRING", "warc_ts TIMESTAMP", "html BINARY",
                "text STRING", "lang STRING"):
        assert col in ddl

    tddl = I.create_tiles_table_ddl()
    # sink schema must match the meshing operator's output schema
    from tin_terrain_spark.operators.meshing import TILE_SCHEMA

    for col in TILE_SCHEMA.split(", "):
        assert col in tddl, col


def test_session_confs_cover_catalog_and_spj():
    confs = I.iceberg_session_confs("lake", "s3://wh")
    assert confs["spark.sql.catalog.lake"].endswith("SparkCatalog")
    assert confs["spark.sql.sources.v2.bucketing.enabled"] == "true"
    assert "IcebergSparkSessionExtensions" in confs["spark.sql.extensions"]
