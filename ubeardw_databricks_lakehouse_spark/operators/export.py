"""Training-data export: deterministic sharding + a verifiable
manifest — the endpoint of the curation pipeline, where the corpus
leaves the warehouse for the training cluster.

Reference parity: the gold pipeline's partitioned sinks
(cf. reference/pipelines/gold_pipeline.py partitioned writes); this
adds what a training loader additionally needs from an export:
- DETERMINISTIC shard assignment (portable md5 bucket, same idiom as
  `operators/sampling.hash_bucket`) so re-export lands every doc in
  the same shard — resumable training and diffable exports;
- a per-shard MANIFEST (row count, payload bytes, order-insensitive
  content digest) the loader verifies before touching the data, and
  that makes two exports comparable without reading the shards.

Scale shape: shard assignment is a map-only column; the physical write
is `partitionBy(shard)` so each shard is its own directory (loader
reads are partition-pruned). The manifest digest must not depend on
row order (writers emit partitions in any order at scale), so it's
md5(xxhash-free, engine-portable): per-row md5 folds via SUM of a
60-bit slice — commutative, reorder-proof — rather than an ordered
string_agg over a 100 TB shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import N_BUCKETS, hash_bucket


def assign_shard(
    df: DataFrame, key: str, n_shards: int, seed: str = "exp1"
) -> DataFrame:
    """Add a ``shard`` column in [0, n_shards): portable md5 bucket of
    the key, folded mod n_shards. Map-only."""
    return df.withColumn(
        "shard", F.pmod(hash_bucket(key, seed), F.lit(n_shards)).cast("int")
    )


def shard_manifest(
    df: DataFrame, key: str, payload_col: str, n_shards: int,
    seed: str = "exp1",
) -> DataFrame:
    """(shard, n_rows, n_payload_chars, content_digest) per shard.

    content_digest sums each row's 60-bit md5(key|payload) slice —
    commutative fold, so the digest is independent of row and
    partition order (two exports match iff their row SETS match).
    One groupBy on the shard key; everything else is map-only. The
    fold accumulates as DECIMAL(38,0) (a 60-bit addend would overflow
    BIGINT within a handful of rows — ANSI Spark would throw) and
    reduces mod 2^60 at the end; DuckDB's HUGEINT sum reproduces it.
    """
    return _manifest_agg(assign_shard(df, key, n_shards, seed), key, payload_col)


def _manifest_agg(sharded: DataFrame, key: str, payload_col: str) -> DataFrame:
    """The manifest aggregation over a frame that already carries a
    ``shard`` column (freshly assigned, or read back from the shard
    partition directories)."""
    # F.concat + explicit coalesce, NOT concat_ws: concat_ws silently
    # SKIPS null arguments, so a null payload would hash like a missing
    # separator while the SQL oracle's `||` nullifies the row — the two
    # engines must both see 'key|' for a null/empty payload.
    row_h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(key).cast("string"),
                    F.lit("|"),
                    F.coalesce(F.col(payload_col).cast("string"), F.lit("")),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return (
        sharded.groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.length(F.col(payload_col)))
            .cast("bigint")
            .alias("n_payload_chars"),
            F.pmod(F.sum(row_h), F.lit(2**60).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("content_digest"),
        )
        .orderBy("shard")
    )


def export_shards(
    df: DataFrame,
    out_dir: str,
    key: str,
    payload_col: str,
    n_shards: int,
    seed: str = "exp1",
    shuffle_seed: str | None = None,
) -> DataFrame:
    """Write the corpus as ``out_dir/shard=N/*.parquet`` and return the
    manifest computed over the same frame (digest over the named
    ``payload_col`` — explicit, never guessed). Shards are directory
    partitions — the loader addresses one shard without listing the
    rest, and a re-export with the same seed is byte-stable at the
    row-set level (manifest-verifiable).

    ``shuffle_seed`` additionally fixes the ROW ORDER inside each
    shard: rows sort by xxhash64(shuffle_seed, key) — a deterministic
    global shuffle, so training order is reproducible run-to-run and
    changes wholesale when the seed does (fresh epoch order without
    touching shard membership). Costs one extra exchange (shard-keyed
    repartition + in-partition sort); without it, within-shard order
    follows whatever the upstream partitioning produced."""
    sharded = assign_shard(df, key, n_shards, seed)
    if shuffle_seed is not None:
        sharded = (
            sharded.withColumn(
                "_ord",
                F.xxhash64(F.lit(shuffle_seed), F.col(key).cast("string")),
            )
            .repartition(n_shards, F.col("shard"))
            .sortWithinPartitions("shard", "_ord")
            .drop("_ord")
        )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    # The manifest describes the BYTES ON DISK, not the input plan: it
    # aggregates the written files read back, so a nondeterministic
    # upstream (sample/rand/unstable limit) can never produce a
    # manifest that disagrees with what the loader will actually read.
    # Cost: one extra scan of the export — map-only + one groupBy,
    # partition-pruned per shard, negligible next to the write itself.
    # Explicit schema: an EMPTY export writes no part files, which
    # would fail schema inference; pinning the writer's schema also
    # pins read-back types exactly.
    written = df.sparkSession.read.schema(sharded.schema).parquet(out_dir)
    return _manifest_agg(written, key, payload_col)
