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

__all__ = ["PII_PATTERNS", "pii_scrub"]

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
