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

__all__ = [
    "embedding_covariance",
    "embedding_pca",
    "embedding_pca_project",
]


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
            # + 0.0 canonicalizes -0.0 to 0.0 after rounding so the
            # value hashes identically to the SQL oracle's round(...)+0.
            (
                F.round(
                    F.col("so") / F.col("N")
                    - (F.col("__ssi") / F.col("N"))
                    * (F.col("__ssj") / F.col("N")),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def embedding_pca(
    df: DataFrame, vec_col: str, dim: int, n_components: int
):
    """Fit PCA over an embedding column: returns ``(components,
    explained_variance)`` — a (n_components × dim) float64 numpy matrix
    of orthonormal principal axes (rows), eigenvalue-descending, and
    the matching variance list.

    Distribution boundary, stated precisely: the COVARIANCE is computed
    distributed (:func:`embedding_covariance` — one pass of
    per-partition matmul partials), and only the d×d matrix crosses to
    the driver — bounded by the embedding dimension squared (64² =
    4096 doubles here), never by the row count.  The eigendecomposition
    of a d×d symmetric matrix is microseconds of driver numpy; shipping
    it to the cluster would be pure overhead.  Sign convention: each
    component's largest-|coordinate| entry is made positive, so the fit
    is deterministic run-to-run (eigenvectors are otherwise only
    defined up to sign)."""
    import numpy as np

    if not (0 < n_components <= dim):
        raise ValueError(
            "embedding_pca: need 0 < n_components <= dim"
        )
    cov = np.zeros((dim, dim), dtype=np.float64)
    for r in embedding_covariance(df, vec_col, dim).collect():
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T.copy()
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    return comps, vals[order].tolist()


def embedding_pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_components: int,
    whiten: bool = False,
) -> DataFrame:
    """Project every embedding onto the corpus' top principal axes:
    (id, proj array<double> of length n_components).  Fit is
    :func:`embedding_pca` (distributed covariance, driver eig of the
    bounded d×d matrix); the projection ships the small component
    matrix inside the ``mapInPandas`` closure — one numpy matmul per
    Arrow batch, no per-row Python, no join.  The dimensionality
    reduction that precedes ANN indexing / near-dup sweeps when raw
    embeddings are wider than the signal.  ``whiten=True`` additionally
    scales each axis by 1/√variance so the projected cloud is unit-
    variance per component — the usual preprocessing before cosine/L2
    indexes that assume isotropy (axes with ~zero variance are left
    unscaled rather than exploded)."""
    import numpy as np

    comps, variances = embedding_pca(df, vec_col, dim, n_components)
    if whiten:
        scale = np.array(
            [1.0 / np.sqrt(v) if v > 1e-12 else 1.0 for v in variances]
        )
        comps = comps * scale[:, None]

    def project(batches):
        import pandas as pd

        w = comps.T  # dim × k
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
            )
            yield pd.DataFrame(
                {"id": pdf["id"], "proj": list((x @ w))}
            )

    out = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("__v")
    ).mapInPandas(project, "id long, proj array<double>")
    return out
