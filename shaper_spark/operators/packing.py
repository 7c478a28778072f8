"""Greedy sequence packing: assign ordered documents to token-budget
chunks (context windows) for training-data assembly.

Packing is inherently sequential *within* a stream — chunk k+1 depends
on where chunk k ended — so the Spark shape is: parallel across groups
(language/source/shard), sequential within a group via one Arrow
``applyInPandas`` call per group. Token totals come from a JVM-side
expression before the group step, so Python touches only (id, tokens).

Rule: docs are taken in ``order_col`` order; a doc joins the current
chunk if it fits, else starts the next chunk. A doc larger than the
budget gets a chunk of its own (never dropped, may overflow) — the
standard behavior before long docs are split upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    token_col: str,
    budget: int,
    chunk_col: str = "chunk",
) -> DataFrame:
    """Returns ``group_cols + [order_col, token_col, chunk_col]`` where
    ``chunk_col`` numbers chunks from 0 within each group."""
    if budget <= 0:
        raise ValueError("pack_sequences: budget must be positive")
    if not group_cols:
        raise ValueError(
            "pack_sequences: group_cols must be non-empty — groups are "
            "the parallelism unit; pack one global stream by providing "
            "a constant group column"
        )
    dtypes = dict(df.dtypes)
    schema = ", ".join(
        [f"`{c}` {dtypes[c]}" for c in group_cols]
        + [
            f"`{order_col}` {dtypes[order_col]}",
            f"`{token_col}` {dtypes[token_col]}",
            f"`{chunk_col}` int",
        ]
    )
    cap = int(budget)

    def pack(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        chunks = []
        chunk, cum = 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if cum and cum + t > cap:
                chunk += 1
                cum = 0
            cum += t
            chunks.append(chunk)
        pdf[chunk_col] = chunks
        return pdf[[*group_cols, order_col, token_col, chunk_col]]

    return (
        df.select(*group_cols, order_col, token_col)
        .groupBy(*group_cols)
        .applyInPandas(pack, schema=schema)
    )
