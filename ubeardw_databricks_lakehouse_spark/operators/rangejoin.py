"""Binned range join — point-in-interval joins without the cross
product.

Spark executes a raw ``l JOIN r ON l.point BETWEEN r.lo AND r.hi`` as
BroadcastNestedLoopJoin (or worse, a cartesian) because there is no
equi-key. The standard scale fix: quantize the range dimension into
fixed-width bins, explode each interval over the bins it covers, bin
the points, equi-join on (bin [+ keys]), and apply the exact BETWEEN
as a residual filter. Shuffle volume is |points| + |intervals| x
avg_span/bin_width rows — linear, keyed, AQE-skew-splittable — and
the equi-join unlocks broadcast/bucketing like any other join.

Pick ``bin_width`` near the median interval span: wider bins cut
interval replication, narrower bins cut residual-filter waste.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Inner join of left points to right intervals [lo, hi] (inclusive),
    optionally also equi-keyed on ``extra_on``. Numeric (long) range
    dimension — cast timestamps to epoch first."""
    extra_on = extra_on or []
    w = F.lit(bin_width)
    binned_l = left.withColumn("_bin", F.floor(F.col(point_col) / w))
    exploded_r = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w))
        ),
    )
    return binned_l.join(exploded_r, ["_bin", *extra_on]).where(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    ).drop("_bin")
