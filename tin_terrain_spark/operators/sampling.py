"""Dataset sampling / mixing operators (training-data pipeline).

  stratified_sample   per-stratum keep rates via a PORTABLE content
                      hash (md5-prefix → int, the same trick the dedup
                      family uses) — NOT Spark's sample()/sampleBy(),
                      whose RNG stream is engine-private and
                      partitioning-dependent. Hash gating is
                      deterministic, reproducible across engines and
                      re-runs, stable under repartitioning, and
                      trivially resumable — the properties a 100 TB
                      mixing job actually needs.
  sample_profile      per-stratum sampled/total counts + realized rate
                      (the mixing report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# default mixing rates (percent) per language stratum
DEFAULT_RATES = {"en": 50, "de": 30, "fr": 30}
DEFAULT_RATE_OTHER = 10


def _hash_pct(col):
    """Deterministic uniform [0, 100) bucket from the id — portable to
    DuckDB as CAST(concat('0x', substr(md5(...),1,14)) AS BIGINT) % 100."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 14), 16, 10
    ).cast("bigint") % 100


def sql_hash_pct(expr: str) -> str:
    return f"(CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 14)) AS BIGINT) % 100)"


def _rate_col(rates: dict, other: int):
    c = F.lit(other)
    for lang, r in sorted(rates.items()):
        c = F.when(F.col("lang") == lang, F.lit(r)).otherwise(c)
    return c


def sql_rate(rates: dict, other: int) -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {r}" for lang, r in sorted(rates.items())
    )
    return f"(CASE {whens} ELSE {other} END)"


def stratified_sample(
    docs: DataFrame, rates: dict | None = None, rate_other: int = DEFAULT_RATE_OTHER
) -> DataFrame:
    """Rows kept iff hash_pct(doc_id) < rate(lang). Pure Column exprs —
    the filter pushes to the scan, no shuffle, no state."""
    rates = DEFAULT_RATES if rates is None else rates
    h = _hash_pct(F.col("doc_id"))
    return (
        docs.withColumn("h_pct", h)
        .filter(F.col("h_pct") < _rate_col(rates, rate_other))
        .select("doc_id", "lang", "h_pct")
    )


def sample_profile(
    docs: DataFrame, rates: dict | None = None, rate_other: int = DEFAULT_RATE_OTHER
) -> DataFrame:
    """Per-lang mixing report: total, sampled, realized rate."""
    rates = DEFAULT_RATES if rates is None else rates
    h = _hash_pct(F.col("doc_id"))
    kept = (h < _rate_col(rates, rate_other)).cast("int")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept).alias("n_sampled"),
        F.round(F.sum(kept) / F.count(F.lit(1)), 6).alias("realized_rate"),
    )


def sql_stratified_sample(rates: dict | None = None, other: int = DEFAULT_RATE_OTHER) -> str:
    rates = DEFAULT_RATES if rates is None else rates
    h = sql_hash_pct("doc_id")
    return f"""
      SELECT doc_id, lang, {h} AS h_pct
      FROM documents
      WHERE {h} < {sql_rate(rates, other)}
    """


def sql_sample_profile(rates: dict | None = None, other: int = DEFAULT_RATE_OTHER) -> str:
    rates = DEFAULT_RATES if rates is None else rates
    h = sql_hash_pct("doc_id")
    return f"""
      SELECT lang, count(*) AS n_total,
             CAST(sum(CASE WHEN {h} < {sql_rate(rates, other)} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
             round(CAST(sum(CASE WHEN {h} < {sql_rate(rates, other)} THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS realized_rate
      FROM documents GROUP BY lang
    """


def host_quota(pages: DataFrame, per_host: int = 3,
               host_col: str = "host", order_col: str = "doc_id") -> DataFrame:
    """Per-host document cap — the anti-mega-host mixing primitive: no
    single host may contribute more than `per_host` docs to the
    training mix. Deterministic: keeps the `per_host` LOWEST order_col
    values per host.

    100 TB shape: a rank-filtered window over (host), which Spark
    plans as WindowGroupLimit — the top-k rows are pre-filtered
    map-side BEFORE the shuffle, so a 10^8-page mega-host ships only
    k rows per input partition, not its whole tail. This is the same
    bounded-skew pattern as the kNN top-k."""
    w = Window.partitionBy(host_col).orderBy(F.col(order_col).asc())
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_host)
        .drop("_rn")
    )
