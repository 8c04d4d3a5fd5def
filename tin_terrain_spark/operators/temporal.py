"""Temporal joins the built-in operators don't express directly:
as-of join and range join (the charter's canonical examples of
operators to re-express Spark-first).

Both avoid the naive theta-join formulation, which Catalyst can only
execute as a BroadcastNestedLoopJoin — O(left x right) predicate
evaluations, the same scale-killer the hex kNN had before the
ring-ball explode:

  - asof_join: union + carry-forward window. ONE shuffle on the join
    key; each side is scanned once; the window is partitioned per key
    (no global sort). This is the standard distributed as-of
    (pandas.merge_asof semantics) and works at any left/right ratio.
  - range_join: bounded bucket-explode + hash equi-join + exact
    refine — identical shape to the hex-ring kNN. The explode factor
    is ceil(span / bucket_width) + 1 per range, so the candidate
    stream is O(rows + ranges x spans/width), not O(rows x ranges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    right_vals: tuple = ("value",),
    left_vals: tuple = ("value",),
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row
    with the greatest ts <= left.ts for the same `on` key (ties on ts
    broken by greatest right id; no match → nulls).

    Plan shape: union the two sides with a side tag, then ONE window
    per key ordered by (ts, side, right id) with last(..., ignorenulls)
    carrying the most recent right row forward onto each left row.
    Right rows sort BEFORE left rows at equal ts, so ts_r == ts_l
    matches (the usual as-of convention).

    The left payload columns (`left_vals`, kept under their own names)
    are symmetrical to `right_vals` (emitted as r_<name>); id, ts, and
    payload types are taken from the input schemas, never assumed.
    """
    rid_t = right.schema[right_id].dataType.simpleString()
    lid_t = left.schema[left_id].dataType.simpleString()
    ts_t = right.schema[ts_col].dataType.simpleString()
    rval_t = {c: right.schema[c].dataType.simpleString() for c in right_vals}
    lval_t = {c: left.schema[c].dataType.simpleString() for c in left_vals}
    r_payload = F.struct(
        F.col(ts_col).alias("r_ts"),
        F.col(right_id).alias("r_id"),
        *[F.col(c).alias(f"r_{c}") for c in right_vals],
    )
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(right_id).alias("_rid"),
        r_payload.alias("_r"),
        F.lit(None).cast(lid_t).alias("_lid"),
        *[F.lit(None).cast(lval_t[c]).alias(f"_l_{c}") for c in left_vals],
    )
    null_r = F.lit(None).cast(
        f"struct<r_ts:{ts_t},r_id:{rid_t},"
        + ",".join(f"r_{c}:{rval_t[c]}" for c in right_vals)
        + ">"
    )
    l = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rid_t).alias("_rid"),
        null_r.alias("_r"),
        F.col(left_id).alias("_lid"),
        *[F.col(c).alias(f"_l_{c}") for c in left_vals],
    )
    u = r.unionByName(l)
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_rid").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_lid").alias(left_id),
        F.col(on),
        F.col(ts_col),
        *[F.col(f"_l_{c}").alias(c) for c in left_vals],
        F.col("_match.r_id").alias("r_id"),
        F.col("_match.r_ts").alias("r_ts"),
        *[F.col(f"_match.r_{c}").alias(f"r_{c}") for c in right_vals],
    )
    return out


def range_join(
    rows: DataFrame,
    ranges: DataFrame,
    value_col: str = "value",
    lo_col: str = "lo",
    hi_col: str = "hi",
    range_id: str = "range_id",
    bucket_width: float = 5.0,
) -> DataFrame:
    """Interval join: rows.value in [lo, hi) per range — as a hash
    equi-join on a bounded bucket explode, never a nested-loop theta
    join. Each range explodes to the buckets it covers (bounded by
    span/width); each row computes its single bucket; the equi-join on
    bucket produces the candidate stream, and the exact [lo, hi)
    predicate refines it. Overlapping ranges are supported (a row can
    match many ranges). Small `ranges` broadcast; at 10^9 ranges the
    same plan degrades gracefully to a shuffled equi-join on bucket."""
    w = float(bucket_width)
    exploded = ranges.select(
        range_id,
        lo_col,
        hi_col,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("bigint"),
                F.floor(F.col(hi_col) / w).cast("bigint"),
            )
        ).alias("_bucket"),
    )
    keyed = rows.withColumn("_bucket", F.floor(F.col(value_col) / w).cast("bigint"))
    return (
        keyed.join(F.broadcast(exploded), "_bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("_bucket")
    )
