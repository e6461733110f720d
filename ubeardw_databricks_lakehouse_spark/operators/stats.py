"""Robust-statistics cleaning ops for numeric feature columns.

Winsorization (percentile clipping) is the standard outlier treatment
before a numeric column feeds model training or reward shaping: values
below the lower / above the upper group percentile clamp to the
boundary instead of being dropped, preserving row count while bounding
influence.

Cross-engine determinism: Spark's exact ``percentile`` and DuckDB's
``PERCENTILE_CONT`` share the same linear-interpolation definition and
produce bit-identical doubles (probed on the events table); clipped
sums follow the plans/common DECIMAL policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize_summary(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Per-group winsorization report: the clip boundaries (exact
    percentiles), how many rows clamp at each side, and the winsorized
    mass (DECIMAL-rounded sum surfaced as DOUBLE).

    Scale shape: ``percentile`` is a partial-aggregate sketch-free
    exact implementation — ONE groupBy pass builds the boundaries
    (per-group value buffers; groups are the parallelism unit), the
    boundary table (|groups| rows) broadcasts back, and the clip +
    summary is a second map-side-combined groupBy. The value stream is
    never globally sorted.
    """
    bounds = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lower})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {upper})").alias("p_hi"),
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi"))
    return (
        df.join(F.broadcast(bounds), group_col)
        .groupBy(group_col)
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("p_lo").alias("p_lo"),
            F.min("p_hi").alias("p_hi"),
            F.sum((v < F.col("p_lo")).cast("int"))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum((v > F.col("p_hi")).cast("int"))
            .cast("bigint")
            .alias("n_clipped_high"),
            F.sum(F.round(clipped, 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_winsorized"),
        )
    )
