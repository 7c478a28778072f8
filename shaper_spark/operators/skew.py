"""Skew-handling utilities: salted two-phase aggregation and salted
replicated joins — the standard remedies when one hot key would pin a
single reducer at 100 TB.

AQE's skew-join handling (enabled in the session) covers sort-merge
joins automatically; these helpers cover the cases AQE can't see:
aggregation skew (a hot group key) and broadcast-ineligible skewed
joins where the small side fits per-key replication.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["salted_agg", "salted_join", "key_skew_report"]

# Aggregates that compose as partial → final over the same function.
_MERGEABLE = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partial, then
    groupBy(keys) final — a hot key's rows spread over ``salt`` reducers
    in phase one, so no single task sees the whole key.

    ``aggs`` maps output column → (function, input column); functions:
    sum / min / max / count / avg (avg decomposes into sum+count).
    Results are exactly the plain groupBy's."""
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (fn, col) in aggs.items():
        fn = fn.lower()
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"__ps_{out}"))
            partial_exprs.append(F.count(col).alias(f"__pc_{out}"))
            final_exprs.append(
                (F.sum(f"__ps_{out}") / F.sum(f"__pc_{out}")).alias(out)
            )
        elif fn in _MERGEABLE:
            partial_exprs.append(_MERGEABLE[fn](col).alias(f"__p_{out}"))
            final_exprs.append(_MERGEABLE[fn](f"__p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported salted aggregate: {fn}")
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: the (large, skewed) left side gets a random salt
    in [0, salt); the right side is replicated ``salt`` times with every
    salt value, and the join key becomes (key, salt). A hot key's rows
    land on ``salt`` different reducers instead of one.

    Use when the right side is too big to broadcast but small enough to
    replicate ``salt``×. Row results are identical to the plain join."""
    salted_left = left.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    replicated_right = right.withColumn("__salt", salts)
    out = salted_left.join(replicated_right, [on, "__salt"], how)
    return out.drop("__salt")


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Shuffle-key skew diagnostic — the "should I salt this?"
    advisory run BEFORE committing a join/agg key at scale. For the
    ``top_n`` heaviest keys: row count, share of the corpus, and the
    ratio to a perfectly uniform key (share × distinct-keys — >10×
    means the heaviest shuffle partition does 10× the average work and
    AQE skew-split or :func:`salted_agg`/:func:`salted_join` is
    warranted). NULL keys are reported like any other value (they are
    a classic skew source).

    Spark shape: ONE groupBy(key) hash-agg (map-side partials — the
    same collapse that makes the report itself skew-proof), a two-row
    broadcast of the global totals, and TakeOrderedAndProject for the
    top-n (no global sort). Returns
    (key, n_rows, share, vs_uniform), heaviest first."""
    if top_n <= 0:
        raise ValueError("key_skew_report: top_n must be > 0")
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("__total"), 6
            ).alias("share"),
            F.round(
                F.col("n_rows").cast("double")
                * F.col("__nkeys")
                / F.col("__total"),
                6,
            ).alias("vs_uniform"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_n)
    )
