"""Stream-stream joins — watermarked interval equi-joins.

Structured Streaming can join two live streams with bounded state when
BOTH sides carry watermarks and the join condition bounds event time
(range condition on the two time columns). State per side is then
O(rows inside the watermark horizon), not O(stream) — Spark drops a
buffered row as soon as the other side's watermark passes its match
window (public semantics: Spark docs "Stream-Stream Joins" +
SPARK-26187 state cleanup).

This generalizes the reference's batch attribution joins to streams —
an extension the reference (batch/DLT engine) does not offer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` to rows of ``left`` with the same ``key``
    where ``left_ts <= right_ts <= left_ts + horizon``.

    Both inputs may be streaming or batch DataFrames; when streaming,
    each gets ``withWatermark`` on its own event-time column, which is
    what lets Spark expire buffered state. The equi-key keeps the join
    a hash join shuffled on ``key`` — the range condition is a residual
    predicate, never a nested loop over unbounded state.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond: Column = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {horizon}"))
    )
    # drop the right-side key so downstream column references resolve
    # unambiguously (the equi-condition makes them equal anyway)
    return lw.join(rw, cond, how).drop(rw[key])
