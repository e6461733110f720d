"""Count-Min sketch (Cormode & Muthukrishnan 2005) — the fixed-size
frequency summary for 100 TB token/key streams: D salted hash rows x W
buckets of exact integer counts. Estimates only ever OVER-count
(collisions add, never subtract), with error <= 2N/W at probability
1 - (1/2)^D — the heavy-hitter / frequency-capping workhorse when an
exact groupBy over the full key space is too wide to materialize.

Unlike the HLL/quantile sketches (`q_approx_profile`, rows-only —
estimates are implementation-defined), this CMS is built from the
md5-salted bucket idiom the battery already uses for MinHash/DSIR, so
every cell and every estimate is a deterministic integer both engines
reproduce exactly — the sketch itself is oracle-checkable.

Scale shape: the build is ONE map-only pass (each key occurrence
explodes into its D (row, bucket) pairs) into ONE groupBy whose output
is D*W cells — map-side combinable, and the result is kilobytes
regardless of corpus size. Estimation broadcasts the cell table and
touches only the candidate keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
