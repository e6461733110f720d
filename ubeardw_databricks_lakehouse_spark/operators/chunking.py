"""Document chunking & sequence packing — training-example assembly.

Two canonical LLM-training-data prep operators:

- **chunking**: split each document into ~N-token windows with
  overlap. Pure integer/array expressions (JVM-side, per-row,
  shuffle-free) so it runs at corpus scale as a narrow map.
- **packing**: concatenate the (sharded, deterministically ordered)
  token stream and split it every ``context_len`` tokens — the
  GPT-style "concat and split" layout that turns ragged documents
  into dense fixed-length training examples (docs straddling a
  boundary span two packs; the trainer masks attention across the
  seam). One window cumsum per shard + a per-row explode over the
  spanned packs — no shuffle wider than the shard.

All boundaries are exact integer math, hence engine-portable for the
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per (doc, chunk): (doc_id, chunk_idx, chunk_text, n_chunk_tokens).

    step = chunk_tokens - overlap; n_chunks = 1 for short docs, else
    1 + ceil((n - chunk_tokens) / step). The final chunk may be short;
    empty docs produce zero chunks.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    n = F.size(F.col("_toks"))
    n_chunks = F.when(n <= 0, F.lit(0)).when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(chunk_tokens)) / F.lit(step)).cast("int")
    )
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n_chunks, F.lit(1)).cast("int")),
        lambda i: F.slice(
            F.col("_toks"), ((i - 1) * step + 1).cast("int"), chunk_tokens
        ),
    )
    # guard: sequence(1, 0) counts DOWN in Spark — empty docs get an
    # explicit empty window list (zero chunks), not two phantom ones
    chunked = toked.select(
        id_col,
        F.col("_toks"),
        F.posexplode(
            F.when(n_chunks >= 1, windows).otherwise(
                F.array().cast("array<array<string>>")
            )
        ).alias("chunk_idx", "_chunk"),
    )
    return chunked.select(
        id_col,
        "chunk_idx",
        F.array_join(F.col("_chunk"), " ").alias("chunk_text"),
        F.size(F.col("_chunk")).alias("n_chunk_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
    context_len: int = 128,
    check_unique: bool = True,
) -> DataFrame:
    """Assign each document's token range to fixed-length training
    packs: within a shard, documents are ordered by ``id_col``, their
    tokens conceptually concatenated, and the stream cut every
    ``context_len`` tokens. A document straddling a cut belongs to
    every pack it overlaps, with the sub-range it contributes.

    Output, one row per (doc, pack) membership:
      (shard, doc_id, n_tokens, pack_id, doc_slice_start,
       pack_slice_start, slice_len)
    where doc_slice_start is 0-based within the doc's tokens and
    pack_slice_start is 0-based within the pack. Zero-token docs emit
    nothing. sum(slice_len) per pack == context_len for every pack but
    the shard's last — the density invariant packing exists for.

    Scale shape: the window is PARTITIONED BY the shard column (date/
    source shards at warehouse scale), so no global single-partition
    sort exists; within a shard the layout is deterministic, which is
    what makes training resumable and the op oracle-checkable.
    """
    b = F.lit(context_len).cast("long")
    toked = df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        tokens(text_col).alias("_toks"),
    ).select("shard", id_col, F.size("_toks").cast("long").alias("n_tokens"))
    # ROWS frame, not the default RANGE: RANGE gives every ORDER-BY tie
    # the full tied cumsum, so duplicate ids would yield overlapping
    # (_start,_end) ranges and break the pack-density invariant. ROWS
    # matches the oracle's ROWS UNBOUNDED PRECEDING. Contract: id_col
    # must be unique per shard (doc_id is) — with duplicates the
    # within-tie order, hence the pack layout, would be nondeterministic.
    # The contract is ENFORCED distributedly (assert_true throws at the
    # offending row — no driver round trip, no extra action); disable
    # via check_unique=False only when the key is unique by construction
    # and the extra (shard, id) window pass matters at scale. The
    # assert rides ON the n_tokens column (assert_true is NULL on
    # success, so the +coalesce is a no-op) — a standalone
    # then-dropped guard column would be pruned away by Catalyst.
    if check_unique:
        wid = Window.partitionBy("shard", id_col)
        guard = F.assert_true(
            F.count("*").over(wid) == 1,
            F.concat(
                F.lit(f"pack_sequences: duplicate {id_col} in shard "),
                F.col("shard").cast("string"),
            ),
        )
        toked = toked.select(
            "shard",
            id_col,
            (
                F.col("n_tokens")
                + F.coalesce(guard.cast("long"), F.lit(0))
            ).alias("n_tokens"),
        )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bounds = toked.select(
        "shard",
        id_col,
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start"),
        F.sum("n_tokens").over(w).alias("_end"),
    ).where(F.col("n_tokens") > 0)
    spanned = bounds.select(
        "shard",
        id_col,
        "n_tokens",
        "_start",
        "_end",
        F.explode(
            F.sequence(
                F.floor(F.col("_start") / b),
                F.floor((F.col("_end") - 1) / b),
            )
        ).alias("pack_id"),
    )
    tok_from = F.greatest(F.col("_start"), F.col("pack_id") * b)
    tok_to = F.least(F.col("_end"), (F.col("pack_id") + 1) * b)
    return spanned.select(
        "shard",
        id_col,
        "n_tokens",
        F.col("pack_id").cast("long").alias("pack_id"),
        (tok_from - F.col("_start")).alias("doc_slice_start"),
        (tok_from - F.col("pack_id") * b).alias("pack_slice_start"),
        (tok_to - tok_from).alias("slice_len"),
    )
