"""Sketch aggregations — the sub-linear-memory path for 100 TB stats.

Exact distinct counts and quantiles shuffle every distinct value; at
corpus scale the right tool is a mergeable sketch: HyperLogLog++ for
cardinality (``approx_count_distinct``), a quantile sketch for
percentiles (``percentile_approx``). Both are Spark built-ins running
as partial aggregates — map-side sketches merge on the reduce side,
so the shuffle carries kilobytes per group regardless of input size.

Sketch outputs are implementation-defined (engine-specific estimates),
so these ops are pytest-bounded against exact answers rather than
DuckDB-hash-checked; the registry query is rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_profile(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    quantile_col: str,
    quantiles: list[float] = (0.5, 0.95, 0.99),
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group HLL cardinality + approximate quantiles in one pass."""
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct(distinct_col, rsd=rsd).alias(
            f"approx_distinct_{distinct_col}"
        ),
        F.percentile_approx(
            quantile_col, list(quantiles), 10_000
        ).alias(f"approx_quantiles_{quantile_col}"),
    )
