"""Skew handling utilities (SURVEY.md §4: hot-cell salting).

The mesh path is skew-immune by construction (cell pre-aggregation caps
per-tile kernel input), but generic aggregations and joins over web
data hit Zipf-hot keys (one domain, one LSH bucket, one tile over a
megacity). Two standard remedies, both pure DataFrame ops:

  salted_agg   two-phase aggregation: groupBy(key, salt) partial →
               groupBy(key) merge. Works for any algebraic aggregate
               expressed as (sum, count, min, max) parts.
  salted_join  replicate the small side R times, salt the big side's
               key with hash(row)%R — bounds any single reducer's input
               at 1/R of the hot key. (AQE skew-join splitting covers
               sort-merge joins automatically; this is for the cases
               AQE can't split, e.g. aggregations feeding applyInPandas.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    agg_cols: dict[str, str],
    salt_buckets: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation over possibly-skewed keys.

    agg_cols: {column: 'sum'|'count'|'min'|'max'|'avg'} — avg is
    decomposed into sum+count and re-divided after the merge, so the
    result is the exact point-weighted mean."""
    salt = (
        F.abs(F.hash(F.col(salt_source))) % salt_buckets
        if salt_source
        else (F.monotonically_increasing_id() % salt_buckets)
    )
    d = df.withColumn("__salt", salt)

    partials = []
    finals = []
    for col, how in agg_cols.items():
        if how == "sum":
            partials.append(F.sum(col).alias(f"__s_{col}"))
            finals.append(F.sum(f"__s_{col}").alias(f"{col}_sum"))
        elif how == "count":
            partials.append(F.count(F.lit(1)).alias(f"__c_{col}"))
            finals.append(F.sum(f"__c_{col}").alias(f"{col}_count"))
        elif how == "min":
            partials.append(F.min(col).alias(f"__mn_{col}"))
            finals.append(F.min(f"__mn_{col}").alias(f"{col}_min"))
        elif how == "max":
            partials.append(F.max(col).alias(f"__mx_{col}"))
            finals.append(F.max(f"__mx_{col}").alias(f"{col}_max"))
        elif how == "avg":
            partials.append(F.sum(col).alias(f"__s_{col}"))
            partials.append(F.count(col).alias(f"__c_{col}"))
            finals.append(
                (F.sum(f"__s_{col}") / F.sum(f"__c_{col}")).alias(f"{col}_avg")
            )
        else:
            raise ValueError(f"unsupported aggregate {how!r}")

    stage1 = d.groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    replicas: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: small side replicated `replicas`x with a
    replica id, big side salted by row hash — every (key, salt) bucket
    holds ≤ 1/replicas of any hot key."""
    rep = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(replicas).withColumnRenamed("id", "__rep")
        )
    )
    salted_big = big.withColumn(
        "__rep", (F.abs(F.hash(*[F.col(c) for c in big.columns])) % replicas)
    )
    out = salted_big.join(rep, [key, "__rep"], "inner")
    return out.drop("__rep")
