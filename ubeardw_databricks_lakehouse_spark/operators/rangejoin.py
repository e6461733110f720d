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

Sort-vs-hash at scale: this join has the same exploded-side
sort-merge shape whose 64M wall the spatial A/B root-caused to the
external SORT, not the join itself (operators/spatial.py,
SCALING.md r11). The same opt-in escape hatch is exposed here:
``join_hint="SHUFFLE_HASH"`` (caller sizes partitions) or
``"SHUFFLE_HASH_AUTO"`` (partition count derived as
``max(shuffle.partitions, ceil(points / target_build_rows))`` via a
cheap count or a caller estimate — an AVERAGE-case bound: hash
partitioning on the bin keys puts a hot BIN whole in one partition,
so bin-skewed data can exceed target_build_rows per build; shrink
``bin_width`` for known-hot bins). The hint is applied to the BINNED
POINT side — the un-replicated side, the analogue of the spatial
home-cell side — and the exploded interval side streams as the
probe. Ladder A/B recorded in SCALING.md r12; the hint stays opt-in
because an under-partitioned hash build OOMs outright where
sort-merge degrades gracefully (the spatial lesson, measured).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int | str,
    extra_on: list[str] | None = None,
    join_hint: str | None = None,
    build_rows_estimate: int | None = None,
    target_build_rows: int = 250_000,
) -> DataFrame:
    """Inner join of left points to right intervals [lo, hi] (inclusive),
    optionally also equi-keyed on ``extra_on``. Numeric (long) range
    dimension — cast timestamps to epoch first.

    ``bin_width``: bins per the module docstring rule (pick near the
    median interval span), or the string ``"auto"`` to derive it — one
    cheap agg computes the median span (``percentile_approx`` over
    ``hi - lo``) and uses ``max(1, median_span)``. The rule is
    MEASURED, not folklore: at the 64M rung, bin = span vs span/8 cut
    the exploded-side shuffle 9x -> 2x rows for a 1.54x wall win with
    a bit-identical match set (SCALING.md r12) — a bigger lever than
    the join hint. Auto pays one extra job over the interval side;
    pass an explicit width when the span distribution is known or the
    intervals frame is expensive to traverse twice.

    ``join_hint``: None (default — planner picks broadcast/sort-merge),
    ``"SHUFFLE_HASH"`` (hash-build the point side; caller must size
    ``spark.sql.shuffle.partitions`` so points/partitions rows fit one
    map's memory), ``"SHUFFLE_HASH_AUTO"`` (derives that partition
    count from ``build_rows_estimate`` or a ``left.count()``, then
    repartitions the point side on the join keys so only the exploded
    interval side re-shuffles), or ``"AUTO"`` (the shipping-plan
    default: Catalyst's free size estimate picks None — the planner
    broadcasts — below ``spark.sql.autoBroadcastJoinThreshold`` and
    SHUFFLE_HASH_AUTO above it; ``core.session.resolve_auto_join_hint``)."""
    extra_on = extra_on or []
    if bin_width == "auto":
        bin_width = int(
            right.select(
                F.percentile_approx(F.col(hi_col) - F.col(lo_col), 0.5).alias("m")
            ).collect()[0]["m"]
            or 1
        )
        bin_width = max(1, bin_width)
    elif not isinstance(bin_width, int) or bin_width < 1:
        raise ValueError(f"bin_width must be a positive int or 'auto', got {bin_width!r}")
    w = F.lit(bin_width)
    binned_l = left.withColumn("_bin", F.floor(F.col(point_col) / w))
    exploded_r = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w))
        ),
    )
    if join_hint == "AUTO":
        # size-triggered: None (planner broadcasts) below the broadcast
        # threshold, the sized hash build above it (core/session.py)
        from ..core.session import resolve_auto_join_hint

        join_hint = resolve_auto_join_hint(binned_l)
    if join_hint == "SHUFFLE_HASH_AUTO":
        n_build = (
            build_rows_estimate if build_rows_estimate is not None else left.count()
        )
        base_parts = int(left.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        n_parts = max(base_parts, math.ceil(n_build / max(1, target_build_rows)))
        binned_l = binned_l.repartition(n_parts, "_bin", *extra_on).hint(
            "SHUFFLE_HASH"
        )
    elif join_hint:
        binned_l = binned_l.hint(join_hint)
    return binned_l.join(exploded_r, ["_bin", *extra_on]).where(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    ).drop("_bin")
