"""Sliding-window document chunking: overlapping token windows for
context assembly (RAG indexing, long-document splitting before
packing).

Chunk k of a document covers tokens [k·stride, k·stride + size). All
array work uses native ``split``/``sequence``/``slice``/``concat_ws``
— generators and slicing are codegen'd Spark expressions, NOT lambda
higher-order functions (the interpreted path text.py documents as
~100× slower). One narrow explode per document; no shuffle at all —
chunking is embarrassingly parallel over the input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 256,
    stride: int | None = None,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_text) — whitespace tokens windowed
    into chunks of ``size`` every ``stride`` (default: no overlap).
    The final window may be shorter; every document yields at least one
    chunk (empty text → one empty chunk), and windows never start past
    the last token."""
    size = int(size)
    stride = size if stride is None else int(stride)
    if size <= 0 or stride <= 0:
        raise ValueError("chunk_documents: size and stride must be positive")
    if stride > size:
        raise ValueError("chunk_documents: stride must be <= size (gaps)")
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    # number of windows: 1 + ceil(max(n - size, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(size), F.lit(0)) / F.lit(stride)
    ).cast("int")
    out = df.select(
        F.col(id_col).alias("id"),
        words.alias("__w"),
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride + 1  # slice() is 1-based
    piece = F.slice(F.col("__w"), start, size)
    return out.select(
        "id",
        "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )
