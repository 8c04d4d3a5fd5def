"""Stateful streaming sessionization via applyInPandasWithState.

The custom stateful operator from the engine charter (§2.10): per-user
sessions with a 30-minute inactivity gap, maintained incrementally as
event micro-batches arrive. State per user = (open session start,
last event ts, event count, value sum); a batch closes a session when
the gap is exceeded (emitting the closed session) and updates or opens
the current one. The still-open session is emitted with closed=False
every batch (update mode), so downstream consumers always see the
latest state; a production deployment would add a processing-time
timeout to flush idle users.

Batch mirror: queries_ext.q_sessionize (lag + running-sum windows) —
the streaming operator must agree with it on closed sessions, which
tests/test_streaming_state.py asserts by replaying the events table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 1800.0

OUTPUT_SCHEMA = (
    "user_id BIGINT, session_start DOUBLE, session_end DOUBLE, "
    "n_events BIGINT, sum_value DOUBLE, closed BOOLEAN"
)
STATE_SCHEMA = "start DOUBLE, last DOUBLE, n BIGINT, s DOUBLE"


def _sessionize_group(key, pdfs, state: GroupState):
    user_id = key[0]
    if state.hasTimedOut:
        if state.exists:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": start,
                        "session_end": last,
                        "n_events": n,
                        "sum_value": s,
                        "closed": True,
                    }
                ]
            )
        return

    rows = pd.concat(list(pdfs)).sort_values(["ts_s", "event_id"])
    if state.exists:
        start, last, n, s = state.get
    else:
        start = last = None
        n, s = 0, 0.0

    closed = []
    for ts, val in zip(rows["ts_s"], rows["value"]):
        if last is not None and ts - last > GAP_SECONDS:
            closed.append(
                {
                    "user_id": user_id,
                    "session_start": start,
                    "session_end": last,
                    "n_events": n,
                    "sum_value": s,
                    "closed": True,
                }
            )
            start, n, s = ts, 0, 0.0
        if start is None:
            start = ts
        last = ts
        n += 1
        s += float(val)

    state.update((start, last, n, s))
    out = closed + [
        {
            "user_id": user_id,
            "session_start": start,
            "session_end": last,
            "n_events": n,
            "sum_value": s,
            "closed": False,
        }
    ]
    yield pd.DataFrame(out)


def stream_sessionize(spark: SparkSession, path_dir: str) -> DataFrame:
    from .events import EVENTS_SCHEMA

    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(path_dir)
        .withColumn("ts_s", F.col("ts").cast("timestamp").cast("double"))
        .select("user_id", "event_id", "ts_s", "value")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
