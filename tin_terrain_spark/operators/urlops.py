"""URL / host operators for the Common-Crawl-style pages table.

The charter's input is pages(url, warc_ts, html, text, lang); the
sandbox documents table carries no url column, so `synth_urls` attaches
one deterministically (integer arithmetic only — the DuckDB oracle
rebuilds the same urls) exactly like synth_media does for the html
column. Host extraction runs JVM-side (parse_url — no Python), and the
per-host profile is the domain-mixing primitive every web-scale
training pipeline needs: at 10^12 pages it is ONE map-side-combined
groupBy on a low-cardinality key (hosts ~ 10^7), with the usual skew
note: a pathological mega-host is still bounded because the partial
aggregates combine map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_HOSTS = 997  # hosts per source bucket (prime → uniform doc_id spread)


def synth_urls(docs: DataFrame) -> DataFrame:
    """Attach a deterministic url per doc:
    https://{source}-{doc_id % 997}.example.org/doc/{doc_id}"""
    return docs.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("-"),
            (F.col("doc_id") % N_HOSTS).cast("string"),
            F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
        ),
    )


def with_host(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """JVM-side host + registrable-domain extraction (no UDF)."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    return pages.withColumn("host", host).withColumn(
        "domain", F.substring_index(F.col("host"), ".", -2)
    )


def host_profile(pages: DataFrame) -> DataFrame:
    """Per-host profile: doc count, language spread, size stats — the
    inputs to domain-level mixing/filtering decisions."""
    return (
        with_host(pages)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("first_doc"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def sql_host_profile() -> str:
    """DuckDB twin: identical url synthesis + regexp host extraction."""
    return f"""
      WITH pages AS (
        SELECT doc_id, lang, n_chars,
               'https://' || source || '-' || CAST(doc_id % {N_HOSTS} AS VARCHAR)
               || '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents
      )
      SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
             count(*) AS n_docs,
             count(DISTINCT lang) AS n_langs,
             min(doc_id) AS first_doc,
             round(avg(n_chars), 6) AS avg_chars,
             max(n_chars) AS max_chars
      FROM pages GROUP BY 1
    """
