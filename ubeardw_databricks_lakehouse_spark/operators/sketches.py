"""Sketch aggregations — the sub-linear-memory path for 100 TB stats.

Exact distinct counts and quantiles shuffle every distinct value; at
corpus scale the right tool is a mergeable sketch: HyperLogLog++ for
cardinality (``approx_count_distinct``), a quantile sketch for
percentiles (``percentile_approx``), and a Count-Min sketch for
frequency point queries. The Spark-built-in sketches run as partial
aggregates — map-side sketches merge on the reduce side, so the
shuffle carries kilobytes per group regardless of input size.

HLL/quantile outputs are implementation-defined (engine-specific
estimates), so those ops are pytest-bounded against exact answers
rather than DuckDB-hash-checked; the registry query is rows-only by
design. The Count-Min sketch below is different: built from the
md5-salted bucket idiom the battery already uses for MinHash/DSIR,
every cell and every estimate is a deterministic integer both engines
reproduce exactly — that sketch IS oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): D salted hash rows x
# W buckets of exact integer counts. Estimates only ever OVER-count
# (collisions add, never subtract), with error <= 2N/W at probability
# 1 - (1/2)^D — the heavy-hitter / frequency-capping workhorse when an
# exact groupBy over the full key space is too wide to materialize.
#
# Scale shape: the build is ONE map-only pass (each key occurrence
# explodes into its D (row, bucket) pairs) into ONE groupBy whose
# output is D*W cells — map-side combinable, and the result is
# kilobytes regardless of corpus size. Estimation broadcasts the cell
# table and touches only the candidate keys.
# ---------------------------------------------------------------------------

DEPTH = 4
WIDTH = 512


def _bucket(col: Column, row: int, width: int) -> Column:
    """md5-salted bucket — the cross-engine hash idiom (cf.
    `operators/curation.dsir_importance`)."""
    h = F.md5(F.concat(F.lit(f"r{row}:"), col))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(width)
    )


def cms_build(
    keys: DataFrame,
    key_col: str = "key",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Build the sketch from a stream of key OCCURRENCES (one row per
    occurrence). Returns (row, bucket, cnt) — D*W cells."""
    pairs = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _bucket(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb")
    )
    return (
        pairs.select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    cells: DataFrame,
    candidates: DataFrame,
    key_col: str = "key",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-query the sketch for each candidate key: the estimate is
    the MIN over the key's D cells (missing cell -> 0). The cell table
    is D*W rows — broadcast by construction."""
    probes = candidates.select(
        key_col,
        F.posexplode(
            F.array(
                *[_bucket(F.col(key_col), j, width) for j in range(depth)]
            )
        ).alias("row", "bucket"),
    )
    joined = probes.join(F.broadcast(cells), ["row", "bucket"], "left")
    return probes.select(key_col).distinct().join(
        joined.groupBy(key_col).agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_estimate")
        ),
        key_col,
    )
