"""Streaming WARC ingest (streaming/ingest.py): replay equality with
the batch parser and incremental processing of late-arriving files."""

import os

import pytest

from tin_terrain_spark.sources.warc import build_warc


@pytest.fixture(scope="module")
def spark():
    from tin_terrain_spark.session import get_spark

    s = get_spark("streaming_warc", cores=4)
    yield s
    s.stop()


def _pages(lo, hi):
    return [
        {
            "url": f"https://h{i % 5}.example.org/doc/{i}",
            "epoch": 1767225600 + i,
            "html": f"<html><body><h1>t {i}</h1><p>body {i}</p></body></html>".encode(),
            "record_id": i,
        }
        for i in range(lo, hi)
    ]


def test_stream_equals_batch_and_is_incremental(spark, tmp_path_factory):
    from tin_terrain_spark.streaming.ingest import stream_warc_extract

    landing = str(tmp_path_factory.mktemp("warc_landing"))
    with open(os.path.join(landing, "a.warc"), "wb") as f:
        f.write(build_warc(_pages(0, 10)))
    with open(os.path.join(landing, "b.warc.gz"), "wb") as f:
        f.write(build_warc(_pages(10, 20), gzip_records=True))

    out = stream_warc_extract(spark, landing)
    q = (
        out.writeStream.format("memory")
        .queryName("warc_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.sql("SELECT * FROM warc_stream").collect()
        assert len(first) == 20
        got = {r["doc_id"]: r for r in first}
        for i in range(20):
            assert got[i]["url"].endswith(f"/doc/{i}")
            assert got[i]["warc_epoch"] == 1767225600 + i
            assert got[i]["http_status"] == 200
            assert got[i]["extracted"] == f"t {i}\nbody {i}"

        # a late-arriving file is processed incrementally: exactly its rows
        with open(os.path.join(landing, "c.warc"), "wb") as f:
            f.write(build_warc(_pages(20, 25)))
        q.processAllAvailable()
        second = spark.sql("SELECT * FROM warc_stream").collect()
        assert len(second) == 25
        assert {r["doc_id"] for r in second} == set(range(25))
    finally:
        q.stop()


def test_stream_cdx_equals_batch(spark, tmp_path_factory):
    from tin_terrain_spark.sources.warc import warc_cdx
    from tin_terrain_spark.streaming.ingest import stream_warc_cdx

    landing = str(tmp_path_factory.mktemp("cdx_landing"))
    with open(os.path.join(landing, "a.warc"), "wb") as f:
        f.write(build_warc(_pages(0, 8)))
    with open(os.path.join(landing, "b.warc.gz"), "wb") as f:
        f.write(build_warc(_pages(8, 14), gzip_records=True))

    q = (
        stream_warc_cdx(spark, landing)
        .writeStream.format("memory")
        .queryName("cdx_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM cdx_stream").collect()
        batch_files = spark.read.format("binaryFile").load(landing)
        want = warc_cdx(batch_files, id_col="path", id_type="STRING").collect()
        key = lambda r: (r["path"], r["rec_offset"])
        assert sorted(map(key, got)) == sorted(map(key, want))
        assert len(got) == 14 and all(r["seek_ok"] for r in got)

        with open(os.path.join(landing, "c.warc"), "wb") as f:
            f.write(build_warc(_pages(14, 17)))
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) c FROM cdx_stream").first()["c"] == 17
    finally:
        q.stop()
