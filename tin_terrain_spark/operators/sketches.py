"""Deterministic distinct-count sketch: KMV (k-minimum values).

KMV / bottom-k (the classic order-statistics sketch): hash every
value with a FIXED portable hash into (0, 1]; with U_(k) the k-th
smallest distinct hash, the distinct count is estimated by
(k-1) / U_(k). Spark's and DuckDB's built-in approx_count_distinct
are both HLL variants whose registers differ by implementation, so
they can never be value-compared — the bottom-k sketch with a fixed
md5-prefix hash is fully deterministic instead, which makes the WHOLE
sketch (its k retained hashes, not just an error bound) independently
recomputable by the DuckDB oracle. Groups holding fewer than k
distinct hashes report their exact count (the sketch is lossless
below k by construction).

100 TB shape: the distinct (group, hash) relation is ONE map-side-
combinable aggregation; the k smallest per group come from a
row_number window that Spark 4 executes with WindowGroupLimit (the
top-k is pushed below the final read, no group materializes more
than k rows downstream); the final per-group fold is k rows each.
Mergeability — union of bottom-k sets then re-truncate — is the
standard distributed property and is exactly what the partial
aggregation performs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _P, _tok_hash


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group distinct-count estimate: (group, n_exact, n_mins,
    kmv_estimate). n_exact (the true distinct count) is included for
    the accuracy contract; a production run would drop it and keep
    only the sketch columns."""
    h = (
        df.select(F.col(group_col), _tok_hash(F.col(value_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = h.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    sketch = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_mins"), F.max("h").alias("hk")
    )
    exact = df.groupBy(group_col).agg(
        F.countDistinct(value_col).alias("n_exact")
    )
    est = F.when(
        F.col("n_mins") < k, F.col("n_mins").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / ((F.col("hk") + F.lit(1)).cast("double")
                               / F.lit(float(_P)))
    )
    return exact.join(sketch, group_col).select(
        group_col,
        "n_exact",
        "n_mins",
        F.round(est, 6).alias("kmv_estimate"),
    )


def sql_kmv_distinct(source_sql: str, group_col: str, value_col: str,
                     k: int = 64) -> str:
    """DuckDB twin over `source_sql` (a query yielding the same
    (group, value) rows)."""
    from .dedup import SQL_TOK_HASH

    vh = SQL_TOK_HASH.format(s=value_col)
    return f"""
      WITH src AS ({source_sql}),
      hs AS (SELECT DISTINCT {group_col}, {vh} AS h FROM src),
      ranked AS (
        SELECT {group_col}, h,
               row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rk
        FROM hs
      ),
      sk AS (
        SELECT {group_col}, count(*) AS n_mins, max(h) AS hk
        FROM ranked WHERE rk <= {k} GROUP BY {group_col}
      ),
      ex AS (
        SELECT {group_col}, count(DISTINCT {value_col}) AS n_exact
        FROM src GROUP BY {group_col}
      )
      SELECT ex.{group_col}, ex.n_exact, sk.n_mins,
             round(CASE WHEN sk.n_mins < {k}
                        THEN CAST(sk.n_mins AS DOUBLE)
                        ELSE {float(k - 1)!r}
                             / ((CAST(sk.hk AS DOUBLE) + 1e0)
                                / {float(_P)!r})
                   END, 6) AS kmv_estimate
      FROM ex JOIN sk USING ({group_col})
    """
