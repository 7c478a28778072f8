"""PII detection and redaction for training-data pipelines.

Counts and masks the three classic structured-PII shapes (emails,
dash-formatted phone numbers, IPv4 addresses) with regexes restricted
to the syntax intersection of Java regex (Spark) and RE2 (DuckDB,
many scrubbing services): no backreferences, no lookaround — so the
differential oracle replays byte-for-byte and the same patterns port
to any engine.

Single-pass codegen'd ``regexp_count``/``regexp_replace`` — no Python,
no HOFs; streams at parquet-scan speed (cf. text.py header for why
that matters at 100 TB).

Reference parity note: the reference has no PII operator — this is
part of the §2C training-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["PII_PATTERNS", "pii_scrub", "pii_density_report"]

# Order matters: emails are redacted before IPs (an email's host part
# may contain dotted digits), IPs before phones (disjoint anyway).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "[IP]"),
    ("phone", "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
]


def _sq(pat: str) -> str:
    """Escape a regex for embedding in a single-quoted SQL literal."""
    return pat.replace("\\", "\\\\").replace("'", "\\'")


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row PII counts plus the redacted text.

    Returns (id, n_email, n_ip, n_phone, clean_text, n_chars_clean).
    Counts are measured on the original text; redactions then apply in
    PII_PATTERNS order, so a count never sees an earlier placeholder."""
    counts = [
        F.expr(f"regexp_count({text_col}, '{_sq(pat)}')").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(
        F.col(id_col).alias("id"),
        *counts,
        clean.alias("clean_text"),
        F.length(clean).alias("n_chars_clean"),
    )


def pii_density_report(
    df: DataFrame,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group PII density (r11): hit counts for each PII_PATTERNS
    shape, affected-document counts, and hits per 1k whitespace tokens
    — the release-gate readout a pipeline reads BEFORE deciding which
    sources need scrubbing at all (scrubbing is a full corpus rewrite;
    the density scan is one aggregate).

    Spark shape: ONE corpus scan → one hash-agg on the group key; the
    per-1k rates are half-up BIGINT micro-divisions re-scaled to
    double (engine-replayable, the threshold-sweep rule).  Returns
    (group, n_docs, sum_tokens, n_email, n_ip, n_phone,
    docs_with_pii, pii_per_1k_tokens), ordered by group."""
    per_row = [
        F.expr(f"regexp_count({text_col}, '{_sq(pat)}')").alias(
            f"__c_{name}"
        )
        for name, pat, _ in PII_PATTERNS
    ]
    staged = df.select(
        F.col(group_col).alias("grp"),
        F.size(F.split(F.col(text_col), " ")).alias("__nw"),
        *per_row,
    )
    total_hits = sum(
        (F.col(f"__c_{name}") for name, _, _ in PII_PATTERNS),
        F.lit(0),
    )
    agg = staged.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("__nw").cast("long")).alias("sum_tokens"),
        *[
            F.sum(F.col(f"__c_{name}").cast("long")).alias(f"n_{name}")
            for name, _, _ in PII_PATTERNS
        ],
        F.sum(F.when(total_hits > 0, 1).otherwise(0)).alias(
            "docs_with_pii"
        ),
    )
    hits_sql = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return (
        agg.select(
            F.col("grp").alias(group_col),
            "n_docs",
            "sum_tokens",
            *[F.col(f"n_{name}") for name, _, _ in PII_PATTERNS],
            "docs_with_pii",
            # hits·1000 per token as a half-up micro-division (µ-units
            # of "per-1k" → ×1e6·1e3 = 2e9 doubling), re-scaled
            (
                F.expr(
                    f"((({hits_sql}) * 2000000000L"
                    " + greatest(sum_tokens, 1L))"
                    " DIV (2L * greatest(sum_tokens, 1L)))"
                ).cast("double")
                / F.lit(1000000.0)
            ).alias("pii_per_1k_tokens"),
        ).orderBy(group_col)
    )
