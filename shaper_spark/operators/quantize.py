"""Int8 embedding quantization — the standard memory/IO lever for a
100 TB vector store: a float32 corpus shrinks 4× (float64 8×) when each
vector is stored as (scale, int8[dim]), and brute-force/IVF scans get
proportionally faster because the scan is bandwidth-bound.

Quantization rule (symmetric, per-vector — the faiss
``ScalarQuantizer`` QT_8bit_direct shape):

    scale = max(|v_i|) / 127          (0-vectors get scale 0, all-zero q)
    q_i   = floor(v_i / scale + 0.5)  (half-up — identical in every
                                       engine, unlike banker's rounding)
    v̂_i  = q_i · scale

Everything is ELEMENTWISE IEEE-754 double arithmetic — no reduction
whose order could differ between engines — so a DuckDB oracle replays
q bit-for-bit, and the integer-valued report columns compare exactly
(no float rounding in the gate).

Spark shape: one Arrow ``mapInPandas`` pass, one numpy matrix per
batch (the veckernel.py pattern — HOF lambdas like ``transform`` run
interpreted at ~100× cost). No shuffle at all: quantization is a map;
the error report adds ONE hash aggregate on the group key.

Reference parity note: no counterpart in the reference — §2C
training-pipeline extension surface (similarity-search adjunct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["quantize_int8", "quantization_report"]


def quantize_int8(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, scale, q): per-vector symmetric int8 quantization.

    ``q`` is ``array<int>`` (values in [-127, 127]); ``scale`` is the
    per-vector dequantization factor. Exact zero vectors quantize to
    scale=0.0 and an all-zero q."""
    out_schema = f"{id_col} long, scale double, q array<int>"

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            scale = np.abs(m).max(axis=1) / 127.0
            safe = np.where(scale == 0.0, 1.0, scale)
            q = np.floor(m / safe[:, None] + 0.5).astype(np.int32)
            q[scale == 0.0] = 0
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "scale": scale,
                    "q": list(q),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(batches, out_schema)


def quantization_report(
    df: DataFrame,
    vec_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group quantization quality: how much structure survives the
    int8 round-trip. Returns one row per group:

      n_vecs        vectors in the group
      sum_q_l1      Σ|q_i| over the group        (exact integer)
      sum_q_sq      Σ q_i² over the group        (exact integer)
      n_saturated   # components with |q_i|=127  (exact integer)
      avg_scale     mean per-vector scale, 6 dp

    The integer columns make the differential gate exact — float
    reductions whose summation order differs between engines only
    touch ``avg_scale``, which is rounded. Per-vector integer stats are
    computed inside the SAME Arrow batch as the quantization (numpy
    row reductions — never ``F.aggregate``/``F.filter`` HOF lambdas,
    which run interpreted at ~100× cost; the group carries through the
    batch, so the only shuffle is the final group hash-agg)."""
    stats_schema = (
        "__grp string, scale double, __l1 long, __sq long, __sat long"
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            scale = np.abs(m).max(axis=1) / 127.0
            safe = np.where(scale == 0.0, 1.0, scale)
            q = np.floor(m / safe[:, None] + 0.5).astype(np.int64)
            q[scale == 0.0] = 0
            yield pd.DataFrame(
                {
                    "__grp": pdf[group_col].astype("string"),
                    "scale": scale,
                    "__l1": np.abs(q).sum(axis=1),
                    "__sq": (q * q).sum(axis=1),
                    "__sat": (np.abs(q) == 127).sum(axis=1),
                }
            )

    per_vec = df.select(
        F.col(group_col).cast("string").alias(group_col), vec_col
    ).mapInPandas(batches, stats_schema)
    return (
        per_vec.groupBy(F.col("__grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("__l1").alias("sum_q_l1"),
            F.sum("__sq").alias("sum_q_sq"),
            F.sum("__sat").alias("n_saturated"),
            F.round(F.avg("scale"), 6).alias("avg_scale"),
        )
        .orderBy(group_col)
    )
