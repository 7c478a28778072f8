"""Hypertable-style time rollups: time_bucket + a continuous-aggregate
cascade where each coarser grain re-aggregates the next finer grain's
partials instead of rescanning the raw table.

The pattern (TimescaleDB continuous aggregates, Druid/Pinot rollup
segments) matters at 100 TB: the raw table is scanned once at the
finest grain; hour→day→week levels each aggregate an input that is
orders of magnitude smaller than raw. Aggregates must be expressed in
re-aggregable partial form — count/sum/min/max combine trivially, avg
is derived as sum/count at every level (never averaged-of-averages).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["time_bucket", "rollup_cascade"]

_PARTIAL_FNS = ("count", "sum", "min", "max", "avg")


def time_bucket(width_seconds: int, ts_col) -> Column:
    """Origin-aligned arbitrary-width bucket (TimescaleDB time_bucket):
    floor(epoch / width) * width, back to timestamp. Unlike
    ``date_trunc`` this supports any width (90s, 6h, 2d)."""
    w = int(width_seconds)
    if w <= 0:
        raise ValueError("time_bucket: width_seconds must be positive")
    epoch = F.unix_timestamp(
        ts_col if isinstance(ts_col, Column) else F.col(ts_col)
    )
    return F.timestamp_seconds(F.floor(epoch / w).cast("bigint") * w)


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    widths_seconds: list[int],
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
) -> dict[int, DataFrame]:
    """Multi-resolution rollup: {width → aggregated frame}.

    ``measures`` maps output name → (fn, column) with fn in
    count/sum/min/max/avg. Each width must divide the next coarser
    width so buckets nest exactly; the finest level scans ``df`` once,
    every other level aggregates the previous level's partials.

    Output columns per level: ``bucket`` + group_cols + measure names.
    """
    widths = sorted(int(w) for w in widths_seconds)
    if not widths:
        raise ValueError("rollup_cascade: need at least one width")
    for fine, coarse in zip(widths, widths[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"rollup_cascade: {coarse}s does not nest {fine}s buckets"
            )
    for name, (fn, _col) in measures.items():
        if fn not in _PARTIAL_FNS:
            raise ValueError(f"rollup_cascade: unsupported fn {fn!r} for {name}")

    # Finest level: raw scan → partials. avg carries (sum, count).
    partial_aggs = []
    for name, (fn, col) in measures.items():
        if fn == "avg":
            partial_aggs.append(F.sum(col).alias(f"__s_{name}"))
            partial_aggs.append(F.count(col).alias(f"__c_{name}"))
        elif fn == "count":
            agg = F.count(F.lit(1)) if col == "*" else F.count(col)
            partial_aggs.append(agg.alias(f"__p_{name}"))
        else:
            partial_aggs.append(getattr(F, fn)(col).alias(f"__p_{name}"))

    finest = (
        df.groupBy(
            time_bucket(widths[0], ts_col).alias("bucket"), *group_cols
        ).agg(*partial_aggs)
    )

    def finalize(level: DataFrame) -> DataFrame:
        cols = [F.col("bucket"), *[F.col(c) for c in group_cols]]
        for name, (fn, _col) in measures.items():
            if fn == "avg":
                cols.append(
                    (F.col(f"__s_{name}") / F.col(f"__c_{name}")).alias(name)
                )
            else:
                cols.append(F.col(f"__p_{name}").alias(name))
        return level.select(*cols)

    out: dict[int, DataFrame] = {widths[0]: finalize(finest)}
    prev = finest
    for w in widths[1:]:
        # Re-aggregate partials: counts/sums add, min/max re-min/max.
        reaggs = []
        for name, (fn, _col) in measures.items():
            if fn == "avg":
                reaggs.append(F.sum(f"__s_{name}").alias(f"__s_{name}"))
                reaggs.append(F.sum(f"__c_{name}").alias(f"__c_{name}"))
            elif fn in ("count", "sum"):
                reaggs.append(F.sum(f"__p_{name}").alias(f"__p_{name}"))
            else:
                reaggs.append(getattr(F, fn)(f"__p_{name}").alias(f"__p_{name}"))
        prev = prev.groupBy(
            time_bucket(w, "bucket").alias("bucket"), *group_cols
        ).agg(*reaggs)
        out[w] = finalize(prev)
    return out
