"""Time-series regularization: gap-filling a per-key event stream onto
a fixed time grid with forward-fill.

The warehouse-reporting op the event tables feed (dashboards, feature
stores, training-label grids all want DENSE series): aggregate events
to a bucket, then materialize EVERY bucket between a key's first and
last observation, carrying the last observed value across gaps.

Scale shape:
- bucket aggregation is one groupBy with map-side combine;
- the grid is `sequence()+explode` per key — rows generated at the
  executors, bounded by (span / step) per key, never a driver loop
  (same machinery as the dim_date/dim_time builders);
- the forward-fill is `last(ignorenulls)` over a window PARTITIONED BY
  KEY (no global sort); frame is the default unbounded-preceding;
- value sums are DECIMAL (order-free), so the result is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STEP_INTERVAL = {"day": "interval 1 day", "hour": "interval 1 hour"}


def gapfill_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "day",
    value_prec: str = "decimal(18,6)",
) -> DataFrame:
    """Dense per-key series: (key, bucket, bucket_value, filled_value,
    observed). ``bucket_value`` is the bucket's DECIMAL sum (null on
    gap buckets), ``filled_value`` carries the last observed bucket
    forward, ``observed`` flags real vs filled rows."""
    if step not in _STEP_INTERVAL:
        raise ValueError(f"step must be one of {sorted(_STEP_INTERVAL)}")
    bucket = F.date_trunc(step, F.col(ts_col))
    per_bucket = (
        df.select(
            F.col(key_col),
            bucket.alias("bucket"),
            F.col(value_col).cast(value_prec).alias("_v"),
        )
        .groupBy(key_col, "bucket")
        .agg(F.sum("_v").cast(value_prec).alias("bucket_value"))
    )
    spans = per_bucket.groupBy(key_col).agg(
        F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx")
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(
            F.sequence("_mn", "_mx", F.expr(_STEP_INTERVAL[step]))
        ).alias("bucket"),
    )
    joined = grid.join(per_bucket, [key_col, "bucket"], "left")
    w = Window.partitionBy(key_col).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        key_col,
        "bucket",
        "bucket_value",
        F.last("bucket_value", ignorenulls=True)
        .over(w)
        .cast(value_prec)
        .alias("filled_value"),
        F.col("bucket_value").isNotNull().alias("observed"),
    )
