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


def interval_concurrency(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    out_ts: str = "ts",
    out_col: str = "concurrent",
    densify_days: bool = False,
) -> DataFrame:
    """Sweep-line concurrency curve over CLOSED [start, end] intervals:
    one row per boundary timestamp with the number of intervals active
    at and after it (until the next boundary) — the interval-algebra
    primitive behind "peak concurrent sessions/users/transfers".

    Classic sweep line, distributed: explode each interval into a
    (+1 at start, -1 just after end) delta pair, AGGREGATE deltas per
    exact timestamp first (so simultaneous starts/ends have no order
    ambiguity — the curve is well-defined without a tiebreak), then a
    global running sum over time via the range-partition + broadcast-
    prefix-offsets machinery (operators/ranking.global_running_sum) —
    never Spark's single-partition global window. 100 TB shape: one
    explode (map-side), one groupBy on ts, one range shuffle; the only
    driver-side data is the O(P) per-partition totals. The groupBy
    before the range shuffle is deliberate: with colliding timestamps
    (the common case — second-grained boundaries) map-side partial
    aggregation shrinks the shuffled volume below the raw 2x-interval
    delta count; fusing the aggregation into the range pass would save
    one shuffle only when boundaries are mostly unique.

    End exclusivity: ends are nudged +1 second so a single-instant
    interval (start == end) still counts as active at its instant and
    two intervals meeting end-to-start at the same second overlap —
    the inclusive-seconds reading both engines reproduce exactly.

    ``densify_days=True`` additionally emits a midnight row for every
    calendar day the curve spans (after the first boundary's day), each
    carrying the concurrency level in force at that instant. This is
    the carry-in fix for per-day rollups of the boundary-only curve:
    without it, a day whose boundaries are all drops (sessions spanning
    midnight that only END during the day) has its per-day MAX
    understated by the carried-in level, and a day blanketed
    boundary-free by one long interval emits no row at all. The
    implementation injects ZERO-delta boundaries at each midnight
    before the running sum — the sweep then prices the carried level
    itself, reusing the same single range shuffle (no forward-fill
    window, no second pass). The midnight grid is derived lazily from
    the delta frame's own min/max (a broadcast 1-row cross join), so
    nothing is collected.
    """
    deltas = (
        intervals.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(start_col).alias("_ts"), F.lit(1).alias("_d")
                    ),
                    F.struct(
                        (F.col(end_col) + F.expr("interval 1 second")).alias(
                            "_ts"
                        ),
                        F.lit(-1).alias("_d"),
                    ),
                )
            ).alias("e")
        )
        .select(F.col("e._ts").alias(out_ts), F.col("e._d").alias("_d"))
    )
    if densify_days:
        # midnights of day(min)+1 .. day(max): every instant where a
        # per-day rollup needs the carried level made explicit. The
        # first day's midnight precedes the first boundary (level 0 by
        # definition) and is skipped.
        midnights = (
            deltas.agg(
                F.to_date(F.min(out_ts)).alias("_d0"),
                F.to_date(F.max(out_ts)).alias("_d1"),
            )
            .where(F.col("_d0").isNotNull())
            .select(
                F.explode(
                    F.sequence(F.date_add(F.col("_d0"), 1), F.col("_d1"))
                ).alias("_day")
            )
            .select(
                F.col("_day").cast("timestamp").alias(out_ts),
                F.lit(0).alias("_d"),
            )
        )
        deltas = deltas.unionByName(midnights)
    deltas = deltas.groupBy(out_ts).agg(
        F.sum("_d").cast("long").alias("_d")
    )
    from .ranking import global_running_sum

    return global_running_sum(
        deltas, [F.col(out_ts)], "_d", out_col=out_col
    ).drop("_d")
