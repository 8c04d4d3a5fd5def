"""Streaming WARC ingestion — the incremental front door of the
crawl pipeline (SURVEY.md §2.10 engine extension, sibling of
streaming/events.py).

A crawler drops finished .warc/.warc.gz files into a landing
directory; `stream_warc_ingest` tails it with the binaryFile file
source and turns every NEW file into pages rows through the same
`sources/warc.py` parser the batch path uses — one stateless
map-only stage, so the stream needs no watermark or state store and
restarts resume from the file-source checkpoint. Downstream streaming
stages (exact dedup within watermark, windowed counts, tile ingest)
compose behind it unchanged; the mesh refresh stays a periodic batch
job, as in the batch pipeline.

Tested by replay equality: streaming over a landing dir == batch
parse of the same files, and late-arriving files produce exactly
their own rows (tests/test_streaming_warc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.warc import warc_pages


def stream_warc_ingest(
    spark: SparkSession, landing_dir: str, glob: str = "*.warc*"
) -> DataFrame:
    """readStream(binaryFile) over the landing dir → pages rows
    (url, warc_epoch, http_status, content_type, html) plus the
    source file path for lineage."""
    files = (
        spark.readStream.format("binaryFile")
        # the binaryFile source schema is fixed, but STREAMING sources
        # require it stated explicitly
        .schema(
            "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"
        )
        .option("pathGlobFilter", glob)
        .load(landing_dir)
    )
    return warc_pages(files, content_col="content")


def stream_warc_extract(
    spark: SparkSession, landing_dir: str, glob: str = "*.warc*"
) -> DataFrame:
    """Ingest + doc-id recovery + HTML extraction, all stateless —
    the streaming twin of the warc_extract batch query."""
    from ..operators.htmlops import extract_html

    pages = stream_warc_ingest(spark, landing_dir, glob).withColumn(
        "doc_id",
        F.regexp_extract(F.col("url"), "/doc/([0-9]+)$", 1).cast("bigint"),
    )
    return extract_html(
        pages, keep_cols=("url", "warc_epoch", "http_status")
    )


def stream_warc_cdx(
    spark: SparkSession, landing_dir: str, glob: str = "*.warc*"
) -> DataFrame:
    """Streaming CDX maintenance: as WARC files land, append their
    random-access index rows (path-keyed byte spans + digests) —
    stateless map-only like the ingest, so the index table stays
    current with the archive without any batch re-scan. The batch
    `warc_cdx` and this stream share the kernel; replay equality is
    the test contract."""
    from ..sources.warc import warc_cdx

    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY"
        )
        .option("pathGlobFilter", glob)
        .load(landing_dir)
    )
    return warc_cdx(files, id_col="path", id_type="STRING")
