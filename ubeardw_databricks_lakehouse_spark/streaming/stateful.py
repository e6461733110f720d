"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no custom streaming state (SURVEY.md §2.8 ST4); this
is a north-star extension: a gap-based streaming sessionizer whose
closed-session output matches the batch sessionization query
(plans/events_q.q_sessionization) — the standard pattern for
stateful ops Structured Streaming lacks natively.

State per user: open-session accumulator (start, last_ts, count, sum).
Value totals accumulate as integer cents so the closed-session sums are
exact and arrival-order independent (matching the batch query's
decimal-exact session_value).
A session closes when the gap to the next event exceeds the timeout or
the group times out under the watermark — state size is O(active
users), not O(history).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", IntegerType()),
        StructField("total_cents", LongType()),
    ]
)

GAP_SECONDS = 1800


def _sessionize_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "total_value": [cents / 100.0],
                }
            )
        return

    events = pd.concat(list(pdfs)).sort_values("ts")
    if state.exists:
        start_us, last_us, n, cents = state.get
    else:
        start_us = last_us = None
        n, cents = 0, 0

    closed: list[tuple] = []
    for ts, value in zip(events["ts"], events["value"]):
        us = ts.value // 1000
        if last_us is not None and us - last_us > GAP_SECONDS * 1_000_000:
            closed.append((start_us, last_us, n, cents))
            start_us, n, cents = us, 0, 0
        if start_us is None:
            start_us = us
        last_us = us
        n += 1
        # exact integer-cents accumulation (values are 2-decimal)
        cents += round(float(value) * 100) if pd.notna(value) else 0

    state.update((start_us, last_us, n, cents))
    # close the open session if no event arrives within the gap
    state.setTimeoutTimestamp(last_us // 1000 + GAP_SECONDS * 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
                "total_value": [c[3] / 100.0 for c in closed],
            }
        )


def streaming_sessionize(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """events(user_id, ts, value) stream -> closed-session rows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
