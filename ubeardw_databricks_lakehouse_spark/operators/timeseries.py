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


def gapfill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "day",
    value_prec: str = "decimal(18,6)",
) -> DataFrame:
    """Dense per-key series with LINEAR interpolation across gaps —
    the other standard regularization mode (forward-fill's companion):
    a gap bucket gets prev + (next − prev) · (t − t_prev)/(t_next −
    t_prev) between its surrounding observations. The grid spans each
    key's first..last OBSERVED bucket, so every gap has both
    neighbors — no head/tail extrapolation case exists.

    Same scale shape as ``gapfill_ffill`` (executor-side grid,
    key-partitioned windows); the interpolated value rounds to 6
    decimals (division is the only inexact step) and lands as DECIMAL
    — oracle-exact.
    """
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
    # integer time position on the step grid (exact in both engines)
    pos = F.datediff(F.col("bucket").cast("date"), F.lit("1970-01-01")).cast(
        "double"
    )
    if step == "hour":
        pos = (F.unix_timestamp("bucket") / F.lit(3600.0)).cast("double")
    wp = Window.partitionBy(key_col).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy(key_col).orderBy("bucket").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    v = F.col("bucket_value").cast("double")
    obs_pos = F.when(F.col("bucket_value").isNotNull(), pos)
    prev_v = F.last(v, ignorenulls=True).over(wp)
    next_v = F.first(v, ignorenulls=True).over(wn)
    prev_p = F.last(obs_pos, ignorenulls=True).over(wp)
    next_p = F.first(obs_pos, ignorenulls=True).over(wn)
    interp = F.when(F.col("bucket_value").isNotNull(), v).otherwise(
        F.round(
            prev_v
            + (next_v - prev_v) * (pos - prev_p) / (next_p - prev_p),
            6,
        )
    )
    return joined.select(
        key_col,
        "bucket",
        "bucket_value",
        interp.cast(value_prec).alias("interp_value"),
        F.col("bucket_value").isNotNull().alias("observed"),
    )
