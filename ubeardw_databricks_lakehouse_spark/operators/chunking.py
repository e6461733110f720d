"""Document chunking — fixed-size token windows with overlap.

The canonical LLM-training-data prep operator: split each document
into ~N-token chunks with O-token overlap. Pure integer/array
expressions (JVM-side, per-row, shuffle-free) so it runs at corpus
scale as a narrow map; chunk counts and boundaries are exact integer
math, hence engine-portable for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
