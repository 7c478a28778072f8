"""Mergeable distinct-count sketches: HyperLogLog rollups.

The rollup cascade (timerollup.py) re-aggregates sums/counts from fine
grains to coarse ones without rescanning raw data — but COUNT(DISTINCT)
is not re-aggregable from partials. The standard scale answer is a
mergeable sketch per fine-grain cell: Spark 3.5+'s Apache DataSketches
HLL (``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``)
makes the union lossless — merging per-day sketches yields the *exact
same* sketch (and estimate) as sketching the whole column directly, so
any coarser grain (week/month/total, any dimension subset) derives from
the stored fine-grain sketches alone. At 100 TB that turns every
"unique users by X" dashboard query into a scan of tiny pre-aggregated
sketch rows.

All JVM-side aggregates — no Python, no shuffle beyond the one
hash-agg each call implies.

Reference parity note: the reference delegates approx distinct to
DuckDB's approx_count_distinct (also HLL, different implementation);
estimates are engine-specific by nature, so the driver entry for this
family is rows-only and the exactness claims are pytest-verified
(union-vs-direct estimate equality, error bounds vs exact counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hll_rollup", "hll_merge", "exact_heavy_hitters"]


def hll_rollup(
    df: DataFrame,
    key_col: str,
    grain_cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``key_col`` per fine-grain cell.

    ``lg_k``=12 → 4 KiB per sketch, ~1.6% relative standard error —
    the DataSketches default tradeoff. Store this frame; derive every
    coarser grain from it with :func:`hll_merge`."""
    return df.groupBy(*grain_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("hll")
    )


def hll_merge(
    sketches: DataFrame,
    grain_cols: list[str] | None = None,
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Merge fine-grain sketches up to ``grain_cols`` (empty/None =
    grand total) and estimate. Union of HLL sketches is lossless:
    the result is bit-identical to sketching the raw data at the
    coarser grain."""
    grouped = (
        sketches.groupBy(*grain_cols) if grain_cols else sketches.groupBy()
    )
    merged = grouped.agg(F.hll_union_agg("hll").alias("hll"))
    return merged.withColumn(
        estimate_col, F.hll_sketch_estimate("hll")
    ).drop("hll")


def _heavy_hitters_lazy(
    df: DataFrame,
    value_col: str,
    min_frac: float,
    sketch_k: int,
) -> tuple[DataFrame, DataFrame]:
    """Build the two-pass plan without executing the final recount.
    Returns (exact, src_persisted) — the public operator collects the
    bounded result and releases the persist; tests pin the recount's
    broadcast plan on the lazy frame."""
    from pyspark import StorageLevel

    # Three passes read src (MG candidates, the total, the exact
    # recount) — persist it once like jaccard_pairs persists its
    # postings, so the corpus is scanned from source a single time.
    src = (
        df.select(F.col(value_col).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def mg_partition(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        # Compact whenever the dict outgrows a small multiple of
        # sketch_k — INSIDE the absorb loop, so transient state is
        # O(cap), not O(batch distinct values).  The generalized MG
        # step (subtract the (k+1)-th largest from everyone, drop ≤0)
        # keeps the superset guarantee: the threshold t has ≥ k+1
        # counters ≥ t, so each compaction removes ≥ (k+1)·t of
        # absorbed mass and Σt ≤ n_p/(k+1) still bounds the decrement
        # any one value can suffer.
        cap = 8 * sketch_k

        def compact() -> None:
            nonlocal counts
            if len(counts) > sketch_k:
                ordered = sorted(counts.values(), reverse=True)
                thresh = ordered[sketch_k]
                counts = {
                    k: c - thresh for k, c in counts.items() if c > thresh
                }

        for pdf in batches:
            for val, c in pdf["v"].value_counts().items():
                counts[val] = counts.get(val, 0) + int(c)
                if len(counts) > cap:
                    compact()
            compact()
        yield pd.DataFrame({"v": list(counts.keys())})

    candidates = src.mapInPandas(mg_partition, "v string").distinct()
    total = src.count()  # one cheap count job; the scalar threshold
    exact = (
        src.join(F.broadcast(candidates), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > F.lit(float(total) * min_frac))
        .select(F.col("v").alias("value"), "n")
        .orderBy(F.col("n").desc(), "value")
    )
    return exact, src


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for *df* (file bytes for parquet
    scans), or None when unavailable."""
    try:
        return int(
            str(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        )
    except Exception:
        return None


def exact_heavy_hitters(
    df: DataFrame,
    value_col: str,
    min_frac: float = 0.002,
    sketch_k: int = 256,
    small_input_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Exact frequent items above ``min_frac`` of the rows, found with
    bounded memory: the classic two-pass sketch-then-verify shape.

    Pass 1 runs a Misra-Gries summary per partition inside
    ``mapInPandas`` (per-batch ``value_counts`` at C speed merged into
    a ≤``sketch_k``-entry dict, compacted by the generalized MG step
    whenever transient state exceeds 8×sketch_k). The
    mergeable-summaries guarantee makes the union of per-partition
    candidates a SUPERSET of every value with global frequency
    > n/(sketch_k+1): if count(x) > Σ n_p/(k+1) then some partition has
    count_p(x) > n_p/(k+1), and MG keeps it there. Pass 2 computes
    EXACT counts for the candidate set only (a broadcast semi-join —
    candidates are ≤ partitions × sketch_k rows) and applies the real
    threshold, so the final output is deterministic, exact, and
    independent of partitioning — identical to the naive full groupBy,
    but the full-cardinality aggregation state never exists anywhere.

    Requires ``min_frac ≥ 1/(sketch_k+1)`` (checked) — otherwise the
    superset guarantee would not cover the threshold.

    Returns (value, n) for values with n > min_frac × total rows,
    ordered by (n desc, value).  The result is ≤ 1/min_frac rows BY
    DEFINITION (each survivor owns > min_frac of the corpus), so it is
    materialized eagerly inside the operator and the persisted scan is
    released before returning — no cached blocks outlive the call."""
    if min_frac < 1.0 / (sketch_k + 1):
        raise ValueError(
            f"exact_heavy_hitters: min_frac={min_frac} below the "
            f"1/(sketch_k+1)={1.0 / (sketch_k + 1):.6f} guarantee bound"
        )
    spark = df.sparkSession
    # Size-gated fast path (the connected-components pattern: keep the
    # bounded-memory machinery for inputs that need it): when the
    # source's plan-estimated bytes fit comfortably in one executor, a
    # plain two-phase groupBy computes the IDENTICAL output in one pass
    # with no Arrow crossing, no persist, and no sketch — the MG
    # sketch exists to bound aggregation state the full-cardinality
    # groupBy would need at corpus scale, not to beat it at megabytes.
    est = _plan_size_bytes(df)
    if est is not None and est < small_input_bytes:
        # same normalized source projection as the sketch path — cast
        # to string and drop NULLs — so both paths return the same
        # schema and never count a NULL group into the total
        counts = (
            df.select(F.col(value_col).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        total = counts.agg(F.sum("n").alias("__t"))
        return (
            counts.crossJoin(F.broadcast(total))
            .filter(F.col("n") > F.col("__t") * F.lit(float(min_frac)))
            .select(F.col("v").alias("value"), "n")
            .orderBy(F.col("n").desc(), "value")
        )
    exact, src = _heavy_hitters_lazy(df, value_col, min_frac, sketch_k)
    rows = [(r["value"], r["n"]) for r in exact.collect()]
    src.unpersist()
    return spark.createDataFrame(rows, "value string, n long").orderBy(
        F.col("n").desc(), "value"
    )
