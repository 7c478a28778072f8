"""Arrow-batched numpy kernels for embedding math.

``F.aggregate`` / ``F.zip_with`` lambdas run on Spark's *interpreted*
higher-order-function path — they bypass whole-stage codegen and cost
~100× per core (the same trap text.py documents). These pandas UDFs
move each Arrow batch into numpy once and do the arithmetic as one
vectorized matmul/einsum — the sanctioned fast path for work the
built-in functions can't express efficiently.

All kernels compute in float64 regardless of the storage type
(array<float>), matching DuckDB's list arithmetic (which promotes to
double) so oracle differentials agree to far below the 1e-6 rounding
the entries apply.
"""

from __future__ import annotations

from pyspark.sql.functions import pandas_udf

__all__ = [
    "vec_norm",
    "pair_dot",
    "pair_cosine",
    "hyperplane_bucket",
    "hyperplane_buckets",
    "hyperplane_bucket_tables",
]


def _mat(series):
    import numpy as np

    return np.vstack(series.to_numpy()).astype(np.float64)


def vec_norm(col):
    """L2 norm of an array column (double)."""

    @pandas_udf("double")
    def _norm(vs):
        import numpy as np
        import pandas as pd

        if len(vs) == 0:
            return pd.Series([], dtype="float64")
        return pd.Series(np.linalg.norm(_mat(vs), axis=1))

    return _norm(col)


def pair_dot(ca, cb):
    """Row-wise dot product of two array columns (double)."""

    @pandas_udf("double")
    def _dot(a, b):
        import numpy as np
        import pandas as pd

        if len(a) == 0:
            return pd.Series([], dtype="float64")
        return pd.Series(np.einsum("ij,ij->i", _mat(a), _mat(b)))

    return _dot(ca, cb)


def pair_cosine(ca, cb):
    """Row-wise cosine similarity of two array columns (double).

    Zero-norm rows yield NULL (NaN), matching SQL division semantics."""

    @pandas_udf("double")
    def _cos(a, b):
        import numpy as np
        import pandas as pd

        if len(a) == 0:
            return pd.Series([], dtype="float64")
        ma, mb = _mat(a), _mat(b)
        denom = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.einsum("ij,ij->i", ma, mb) / denom
        return pd.Series(out)

    return _cos(ca, cb)


def hyperplane_bucket(col, hyperplanes):
    """Sign-pattern bucket id over a fixed hyperplane matrix (int).

    ``hyperplanes`` is a (planes, dim) list/ndarray closed over by the
    UDF (broadcast via pickle — tiny). bit p = [v·h_p >= 0]; bucket =
    Σ bit_p · 2^p. One matmul per Arrow batch."""
    import numpy as np

    H = np.asarray(hyperplanes, dtype=np.float64)
    powers = (2 ** np.arange(H.shape[0])).astype(np.int64)

    @pandas_udf("int")
    def _bucket(vs):
        import pandas as pd

        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        bits = (_mat(vs) @ H.T) >= 0
        return pd.Series((bits @ powers).astype("int32"))

    return _bucket(col)


def hyperplane_bucket_tables(col, hyperplane_list):
    """One bucket id per hash table (array<int>) from a LIST of
    per-table (planes, dim) matrices — e.g. the lsh_topk convention of
    table ``t`` seeded ``seed + t``.  The matrices are vstacked so one
    Arrow transfer + one matmul covers every table (vs one pandas-UDF
    invocation per table, which re-ships the vector column each
    time)."""
    import numpy as np

    mats = [np.asarray(h, dtype=np.float64) for h in hyperplane_list]
    planes = mats[0].shape[0]
    tables = len(mats)
    H = np.vstack(mats)  # (tables*planes, dim)
    powers = (2 ** np.arange(planes)).astype(np.int64)

    @pandas_udf("array<int>")
    def _buckets(vs):
        import pandas as pd

        if len(vs) == 0:
            return pd.Series([], dtype="object")
        bits = ((_mat(vs) @ H.T) >= 0).reshape(-1, tables, planes)
        return pd.Series(list((bits @ powers).astype("int32")))

    # asNondeterministic: a downstream bucket equi-join infers
    # IsNotNull(bucket), which pushed below the posexplode re-derives
    # as size(__bs)>0 and re-evaluates this UDF a SECOND time per row
    # (two ArrowEvalPython nodes per side — the optimizer copies, not
    # moves, the expression).  The function is pure; the marker only
    # forbids the optimizer from duplicating/reordering it.
    return _buckets.asNondeterministic()(col)


def hyperplane_buckets(col, tables: int, planes: int, seed: int):
    """One bucket id per hash table (array<int>, length ``tables``).

    The (tables·planes, dim) hyperplane stack is generated *inside* the
    UDF from (seed, observed dim) — deterministic across executors and
    batches, and it spares the driver a blocking first()-row probe just
    to learn the dimensionality. One matmul per Arrow batch covers every
    table; the bit matrix reshapes to (rows, tables, planes) and
    collapses to per-table bucket ids."""
    import numpy as np

    powers = (2 ** np.arange(planes)).astype(np.int64)
    cache: dict[int, object] = {}

    def _stack(dim: int):
        H = cache.get(dim)
        if H is None:
            rng = np.random.RandomState(seed)
            H = cache[dim] = rng.standard_normal((tables * planes, dim))
        return H

    @pandas_udf("array<int>")
    def _buckets(vs):
        import pandas as pd

        if len(vs) == 0:
            return pd.Series([], dtype="object")
        mat = _mat(vs)
        bits = ((mat @ _stack(mat.shape[1]).T) >= 0).reshape(
            len(mat), tables, planes
        )
        return pd.Series(list((bits @ powers).astype("int32")))

    return _buckets(col)
