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

__all__ = ["hll_rollup", "hll_merge"]


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
