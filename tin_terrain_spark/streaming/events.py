"""Structured-Streaming path for the events stream table.

The reference is a batch CLI with no streaming (SURVEY.md §2.10); this
module is the engine extension that makes the same windowed aggregates
(q_events_window) and tile-ingest flow incremental:

  stream_windowed_counts  readStream → watermark → tumbling window agg
                          (late data handled by the watermark)
  stream_tile_ingest      incremental geocode + tile assignment of a
                          pages stream — the streaming front half of the
                          dem2tintiles pipeline (mesh refresh stays a
                          periodic batch job over the cell store)

Tested with the parquet source + memory sink + processAllAvailable()
(synchronous drain) in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import geocode_exprs as GX

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def stream_windowed_counts(
    spark: SparkSession, path_dir: str, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")  # source needs a dir
        .parquet(path_dir)
        .withColumn("ts_tz", F.col("ts").cast("timestamp"))
    )
    return (
        ev.withWatermark("ts_tz", watermark)
        .groupBy(F.window("ts_tz", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )


DOCS_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def stream_tile_ingest(spark: SparkSession, path_dir: str, zoom: int = 3) -> DataFrame:
    """Incremental geocode+tile keys for a stream of pages — stateless
    per-row column math, so it runs unchanged under readStream."""
    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(path_dir)
    )
    return docs.select(
        "doc_id",
        F.expr(GX.mercator_x_sql("doc_id")).alias("x"),
        F.expr(GX.mercator_y_sql("doc_id")).alias("y"),
        F.expr(GX.tile_sql(GX.mercator_x_sql("doc_id"), zoom)).alias("tile_x"),
        F.expr(GX.tile_sql(GX.mercator_y_sql("doc_id"), zoom)).alias("tile_y"),
    )


def stream_exact_dedup(
    spark: SparkSession, path_dir: str, watermark: str = "1 hour",
    glob: str = "*.parquet",
) -> DataFrame:
    """Streaming exact dedup: first-seen page per content hash.

    The charter's exact-dedup operator (hash-groupBy in batch,
    operators/dedup.exact_dedup) as an incremental stream: duplicates
    arriving within the ingest-time watermark horizon are suppressed
    with BOUNDED state (dropDuplicatesWithinWatermark keeps one
    md5+timestamp per distinct page inside the horizon and evicts the
    rest — at web-crawl scale the state is the working set, not the
    corpus). Cross-horizon dups are handled by the periodic batch
    exact_dedup compaction, the standard lambda split."""
    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("pathGlobFilter", glob)
        .parquet(path_dir)
    )
    hashed = docs.withColumn("text_md5", F.md5(F.col("text"))).withColumn(
        "ingest_ts", F.current_timestamp()
    )
    return hashed.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["text_md5"]
    )
