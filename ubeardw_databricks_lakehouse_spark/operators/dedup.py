"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH, SimHash.

LLM-training-data dedup at 100 TB is join-geometry engineering:

- **exact**: one hash-groupBy on a content fingerprint. Single shuffle,
  map-side combine; survivor = min(id).
- **n-gram Jaccard**: pairwise — needs blocking to stay sub-quadratic.
  ``jaccard_pairs`` takes a blocking column (lang, length bucket, LSH
  band, ...); pairs only form within a block.
- **MinHash+LSH**: the scale path. Signatures are per-row (narrow);
  banding turns near-dup search into an equi-join on (band_idx,
  band_hash) — Spark shuffles both sides by band key, candidate pairs
  emerge co-partitioned. No O(n^2) anywhere; skewed bands (common
  shingles) are handled by AQE skew-join splitting.
- **SimHash**: per-row signature (60 effective bits); hamming-radius
  candidates via band rotation over bits 0..59.

Hash functions are md5-based on purpose: md5 is identical in Spark and
DuckDB, so signatures (and therefore the whole pipeline) are
oracle-checkable cross-engine. String min over hex = numeric min over
the underlying 128-bit value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, tokens


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical (whitespace-normalized) docs.

    Returns (fingerprint, survivor_id, n_dups) with n_dups >= 1; keep
    survivor_id per group to dedup.
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count("*").alias("n_docs"),
        )
    )


def shingles_from_tokens(toks: Column, n: int = 2) -> Column:
    """Distinct word n-grams from a pre-computed token array.

    Built as zip_with over n shifted slices — measured ~3x faster than
    the index-transform + element_at form (HOFs are interpreted, and
    slice+zip touches each token once instead of per-index lookups).
    """
    if n == 1:
        return F.array_distinct(toks)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(acc)


def word_shingles(text_col: str, n: int = 2) -> Column:
    """Distinct word n-gram shingles as an array column (pure SQL fns)."""
    return shingles_from_tokens(tokens(text_col), n)


def with_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 2, out_col: str = "_sh"
) -> DataFrame:
    """Two-projection shingle computation: tokens land in their own
    projection so the shingle expression references them once —
    Catalyst would otherwise re-derive the token array per reference
    inside the combined expression (measured 9x slowdown)."""
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    return toked.select(
        id_col, shingles_from_tokens(F.col("_toks"), n).alias(out_col)
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Pairwise n-gram Jaccard within blocks; pairs above threshold.

    Output: (id_a, id_b, n_shingles_a, n_shingles_b, n_common, jaccard)
    — all integer-derived, so exactly reproducible in any engine.
    """
    toked = df.select(
        F.col(id_col).alias("_id"),
        *( [F.col(block_col).alias("_block")] if block_col else [F.lit(1).alias("_block")] ),
        tokens(text_col).alias("_toks"),
    )
    sh = toked.select(
        "_id", "_block", shingles_from_tokens(F.col("_toks"), n).alias("_sh")
    )
    a = sh.select(
        F.col("_id").alias("id_a"), F.col("_block"), F.col("_sh").alias("sh_a")
    )
    b = sh.select(
        F.col("_id").alias("id_b"), F.col("_block").alias("_block_b"),
        F.col("_sh").alias("sh_b"),
    )
    pairs = a.join(
        b, (F.col("_block") == F.col("_block_b")) & (F.col("id_a") < F.col("id_b"))
    )
    n_common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    n_a = F.size(F.col("sh_a"))
    n_b = F.size(F.col("sh_b"))
    jac = F.try_divide(n_common.cast("double"), (n_a + n_b - n_common))
    return (
        pairs.select(
            "id_a",
            "id_b",
            n_a.alias("n_shingles_a"),
            n_b.alias("n_shingles_b"),
            n_common.alias("n_common"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") > threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    shingle_n: int = 2,
) -> DataFrame:
    """Per-doc MinHash signature: sig_j = min over shingles of
    md5(j || '|' || shingle). Narrow per-row compute, no shuffle."""
    # Explode + groupBy-min rather than 8 array_min(transform(...)) in one
    # projection: Catalyst has no CSE across lambda expressions, so the
    # projection form re-derives the shingle array per signature column
    # (measured 8x+ slowdown). The explode form computes each shingle
    # once, hashes it n_hashes times, and min-combines map-side — one
    # shuffle on the doc id, linear work, and it scales out with data.
    exploded = with_shingles(df, id_col, text_col, shingle_n).select(
        F.col(id_col), F.explode_outer(F.col("_sh")).alias("_sh")
    )
    hashed = exploded.select(
        id_col,
        *[
            F.md5(F.concat(F.lit(f"{j}|"), F.col("_sh"))).alias(f"_h{j}")
            for j in range(n_hashes)
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"_h{j}").alias(f"sig_{j}") for j in range(n_hashes)]
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Band the signature, equi-join on (band_idx, band_hash).

    Docs sharing ANY band collide; output distinct candidate (id_a,
    id_b) pairs. This is the shuffle-geometry heart of LSH dedup: the
    only join key is the band hash, so Spark never forms cross products
    beyond genuine collision buckets.
    """
    # shingle-less docs have NULL signatures; concat_ws would collapse
    # them all to md5('') — one giant false bucket — so they exit here
    # (an empty doc has no near-duplicates by definition)
    signatures = signatures.filter(F.col("sig_0").isNotNull())
    n_bands = n_hashes // band_size
    bands = []
    for b in range(n_bands):
        member = F.concat_ws(
            "|", *[F.col(f"sig_{b * band_size + k}") for k in range(band_size)]
        )
        bands.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(member).alias("band_hash"))
        )
    exploded = signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")
    a = exploded.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"),
        F.col("band_idx").alias("band_idx_b"),
        F.col("band_hash").alias("band_hash_b"),
    )
    return (
        a.join(
            b,
            (F.col("band_idx") == F.col("band_idx_b"))
            & (F.col("band_hash") == F.col("band_hash_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def simhash64(text_col: str, shingle_n: int = 1) -> Column:
    """SimHash signature (60 effective bits) as pure SQL expressions.

    For each of 60 bit positions, sum +/-1 weighted by the bit of the
    shingle's hash; the sign of the sum is the signature bit. 60 (not
    64) because conv(hex,16,10) of 15 hex chars is the widest slice
    that stays inside a signed long — consumers banding the signature
    must band over bits 0..59 (bits 60-63 are always 0).
    """
    sh = word_shingles(text_col, shingle_n)
    # per-shingle 60-bit value from the first 15 hex chars of md5
    hashed = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    )
    def voter(mask: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, 1
        ).otherwise(-1)

    bit_exprs = []
    for bit in range(60):
        votes = F.aggregate(hashed, F.lit(0), voter(1 << bit))
        bit_exprs.append(F.when(votes > 0, F.lit(1 << bit)).otherwise(F.lit(0)))
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out + e
    return out.cast("long")


def neardup_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """The production near-dup pipeline: MinHash -> LSH candidates ->
    exact Jaccard verification. Never forms the O(n^2) cross product;
    recall is the LSH collision probability 1-(1-j^r)^b (documented
    trade-off — raise n_hashes/bands for higher recall).

    Output: (id_a, id_b, n_shingles_a, n_shingles_b, n_common) for
    verified pairs — all integers, exactly engine-portable.
    """
    # shingles are derived twice (here and inside minhash_signatures);
    # measured: caching the shingle DF is SLOWER locally (array
    # serialization dominates). At warehouse scale, persist the
    # signature table instead of recomputing per run.
    sh = with_shingles(df, id_col, text_col, shingle_n).select(
        F.col(id_col).alias("_id"), F.col("_sh")
    )
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, id_col, n_hashes, band_size)
    joined = (
        cands.join(
            sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a"
        )
        .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
    )
    n_common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    n_a = F.size(F.col("sh_a"))
    n_b = F.size(F.col("sh_b"))
    # try_divide: a pair of empty-shingle docs has union 0 (ANSI would
    # raise); NULL jaccard fails the threshold and drops out
    jac = F.try_divide(n_common.cast("double"), (n_a + n_b - n_common))
    return joined.select(
        "id_a",
        "id_b",
        n_a.alias("n_shingles_a"),
        n_b.alias("n_shingles_b"),
        n_common.alias("n_common"),
    ).where(jac > threshold)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, vectorized.

    Arrow-batched mapInPandas: each batch of rows does one numpy
    matmul against the (broadcast) normalized corpus matrix instead of
    per-pair expression folds — ~100x over HOF-per-pair. At true scale
    swap the broadcast matrix for block-partitioned tiles (same batch
    kernel, outer join over tile grid).
    """
    from .similarity import _collect_matrix

    spark = df.sparkSession
    ids, mat = _collect_matrix(df, id_col, vec_col)
    b = spark.sparkContext.broadcast((ids, mat))

    import numpy as np
    import pandas as pd

    def score(batches):
        all_ids, all_mat = b.value
        for pdf in batches:
            if len(pdf) == 0 or len(all_ids) == 0:
                continue
            batch_ids = pdf[id_col].to_numpy()
            bm = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            bm /= np.linalg.norm(bm, axis=1, keepdims=True)
            sims = bm @ all_mat.T
            rows_a, rows_b = [], []
            for r, ida in enumerate(batch_ids):
                hits = all_ids[(sims[r] > threshold) & (all_ids > ida)]
                rows_a.extend([ida] * len(hits))
                rows_b.extend(hits.tolist())
            yield pd.DataFrame({"id_a": rows_a, "id_b": rows_b})

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )
    return df.select(id_col, vec_col).mapInPandas(score, schema)
