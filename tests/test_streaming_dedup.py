"""Streaming exact dedup: bounded-state first-seen-per-hash over a
pages stream, verified against the batch operator on a replayed source
containing duplicates."""

from __future__ import annotations

import shutil

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from tin_terrain_spark.session import get_spark

    yield get_spark("stream_dedup_test", cores=8)


def test_stream_dedup_matches_batch(spark, tmp_path):
    # a source dir where every page arrives twice (two identical files)
    src = tmp_path / "stream_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", src / "a.parquet")
    shutil.copy(f"{SF_DIR}/documents.parquet", src / "b.parquet")

    from tin_terrain_spark.operators.dedup import exact_dedup
    from tin_terrain_spark.streaming.events import stream_exact_dedup

    total = spark.read.parquet(str(src)).count()
    batch_groups = exact_dedup(spark.read.parquet(str(src))).count()
    assert total == 2 * batch_groups  # every page duplicated

    dedup = stream_exact_dedup(spark, str(src))
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM dedup_out").toPandas()
    finally:
        q.stop()

    # one survivor per content hash, matching the batch group count
    assert len(out) == batch_groups
    assert out["text_md5"].nunique() == batch_groups
