"""Conditional-max event pivot — event log to one-row-per-entity grain.

The load-bearing operator of the reference warehouse: ``trip_events``
(one row per lifecycle event) pivots to ``trip_fact`` (one row per
trip) via ``max(when(event_type == X, event_time))`` per milestone plus
``max(metric)`` for each payload metric (reference:
pipelines/gold_pipeline.py:674-704).

Properties that matter at scale:
- **order-insensitive**: max() commutes, so late/out-of-order CDC
  delivery needs no sorting and no window (SURVEY.md §2.8 ST5);
- **single shuffle**: one hash aggregation on the entity key with
  map-side partial aggregation; no join, no window, no sort;
- skew: a hot entity key degrades gracefully (partial aggs combine);
  AQE skew handling applies if the group-by is followed by a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def milestone_col(event_type_col: str, event_time_col: str, event_type: str) -> Column:
    return F.max(
        F.when(F.col(event_type_col) == event_type, F.col(event_time_col))
    ).alias(f"{event_type}_at")


def event_pivot(
    df: DataFrame,
    keys: list[str],
    event_type_col: str,
    event_time_col: str,
    event_types: list[str],
    max_metrics: list[str] | None = None,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """GroupBy ``keys``; per event type a ``<type>_at`` milestone column;
    per metric a ``max(metric)`` column (payload fields are sparse — max
    over nulls selects the single carrying event's value)."""
    aggs: list[Column] = [
        milestone_col(event_type_col, event_time_col, et) for et in event_types
    ]
    for m in max_metrics or []:
        aggs.append(F.max(F.col(m)).alias(m))
    aggs.extend(extra_aggs or [])
    return df.groupBy(*keys).agg(*aggs)
