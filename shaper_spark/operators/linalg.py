"""Distributed dense linear algebra over embedding columns.

The one pattern that matters at 100 TB: reduce a (rows × d) matrix to
d×d / d-sized statistics with ONE pass of per-partition vectorized
partials (numpy matmul inside ``mapInPandas``) followed by a tiny
keyed aggregation of the partials — never a rows×d² explode, never a
driver-side collect of vectors.  A 1000-executor cluster computes
X^T·X this way at scan speed: each task emits one ~(d + d²)-double
row, the combine shuffles executor-count rows, not data.

Reference parity note: the reference has no linear-algebra surface —
§2C training-pipeline extension (embedding whitening / PCA prep reads
exactly this covariance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["embedding_covariance"]


def embedding_covariance(
    df: DataFrame, vec_col: str, dim: int
) -> DataFrame:
    """Population covariance matrix of a ``array<float>`` embedding
    column: rows (i, j, cov) for the upper triangle i ≤ j (0-based),
    ordered, ``cov`` rounded to 6 dp (oracle-replayable).

    cov(i,j) = E[x_i·x_j] − E[x_i]·E[x_j] over all rows, accumulated in
    float64.  Spark shape (module docstring): per-partition numpy
    partials (count, Σx as d doubles, Σx·xᵀ as d² doubles, one Arrow
    row per partition) → posexplode the partial vectors → keyed sums —
    the only shuffle is partition-count × d² PARTIAL rows.  The d-row
    mean table broadcasts into the final expression."""
    if dim <= 0:
        raise ValueError("embedding_covariance: dim must be > 0")
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    d = int(dim)

    def partials(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = np.zeros(d, dtype=np.float64)
        o = np.zeros((d, d), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            )
            n += x.shape[0]
            s += x.sum(axis=0)
            o += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "o": [o.ravel().tolist()]}
            )

    part = df.select(F.col(vec_col).alias("v")).mapInPandas(
        partials, "n long, s array<double>, o array<double>"
    )
    # keyed combine of the partials: every partial contributes exactly
    # one row per flat index k, so sum(n) within a k-group is the total
    # row count N — no separate count job.
    o_sums = (
        part.select("n", F.posexplode("o").alias("k", "val"))
        .groupBy("k")
        .agg(F.sum("val").alias("so"), F.sum("n").alias("N"))
    )
    means = F.broadcast(
        part.select(F.posexplode("s").alias("i", "val"))
        .groupBy("i")
        .agg(F.sum("val").alias("ss"))
    )
    mi = means.select(
        F.col("i").alias("__i"), F.col("ss").alias("__ssi")
    )
    mj = means.select(
        F.col("i").alias("__j"), F.col("ss").alias("__ssj")
    )
    return (
        o_sums.select(
            (F.col("k") / d).cast("int").alias("i"),
            (F.col("k") % d).cast("int").alias("j"),
            "so",
            "N",
        )
        .filter(F.col("i") <= F.col("j"))
        .join(F.broadcast(mi), F.col("i") == F.col("__i"))
        .join(F.broadcast(mj), F.col("j") == F.col("__j"))
        .select(
            "i",
            "j",
            F.round(
                F.col("so") / F.col("N")
                - (F.col("__ssi") / F.col("N"))
                * (F.col("__ssj") / F.col("N")),
                6,
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )
