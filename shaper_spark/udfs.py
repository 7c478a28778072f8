"""DuckDB-parity scalar functions Spark lacks and no expression can
express — registered once per session as Python UDFs (the reference's
UDF surface: server/util/duckdb.go:14-57 registers scalar Go UDFs the
same way; SURVEY §2B row 34).

These are SLOW-PATH functions (row-at-a-time Python): string-distance
scores, Unicode normalization, path/URL helpers, special math. They
exist for dialect completeness on result-sized data — corpus-scale
fuzzy matching goes through the vectorized operators
(``operators/dedup.py``, ``operators/similarity.py``), never these.
All implementations are stdlib-only and deterministic.
"""

from __future__ import annotations

import math
import unicodedata
from urllib.parse import quote, unquote

__all__ = ["register_compat_udfs"]


def _damerau_levenshtein(a: str | None, b: str | None) -> int | None:
    """TRUE (unrestricted) Damerau-Levenshtein — DuckDB's semantics:
    edits between the members of a transposition are allowed, so
    dl('ca', 'abc') = 2 where the restricted OSA variant says 3
    (Lowrance-Wagner algorithm)."""
    if a is None or b is None:
        return None
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    maxdist = la + lb
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    da: dict[str, int] = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l_ = db
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l_] + (i - k - 1) + 1 + (j - l_ - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ma = [False] * la
    mb = [False] * lb
    matches = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def _jaro_similarity(a: str | None, b: str | None) -> float | None:
    if a is None or b is None:
        return None
    return _jaro(a, b)


def _jaro_winkler(a: str | None, b: str | None) -> float | None:
    if a is None or b is None:
        return None
    j = _jaro(a, b)
    if j <= 0.7:  # standard boost threshold
        return j
    prefix = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


def _strip_accents(s: str | None) -> str | None:
    if s is None:
        return None
    return "".join(
        c
        for c in unicodedata.normalize("NFD", s)
        if not unicodedata.combining(c)
    )


def _nfc_normalize(s: str | None) -> str | None:
    return None if s is None else unicodedata.normalize("NFC", s)


def _parse_dirname(s: str | None) -> str | None:
    """First path component, DuckDB parse_dirname default separator."""
    if s is None:
        return None
    parts = [p for p in s.split("/")]
    if s.startswith("/"):
        return "/"
    return parts[0] if parts else ""


def _parse_filename(s: str | None) -> str | None:
    if s is None:
        return None
    return s.rstrip("/").rsplit("/", 1)[-1]


def _parse_path(s: str | None) -> list[str] | None:
    if s is None:
        return None
    out = ["/"] if s.startswith("/") else []
    out.extend(p for p in s.split("/") if p)
    return out


def _url_encode(s: str | None) -> str | None:
    return None if s is None else quote(s, safe="")


def _url_decode(s: str | None) -> str | None:
    return None if s is None else unquote(s)


def _gamma(x: float | None) -> float | None:
    if x is None:
        return None
    try:
        return math.gamma(x)
    except ValueError:
        return None


def _lgamma(x: float | None) -> float | None:
    if x is None:
        return None
    try:
        return math.lgamma(x)
    except ValueError:
        return None


def _signbit(x: float | None) -> bool | None:
    if x is None:
        return None
    return math.copysign(1.0, x) < 0


_REGISTRY = [
    ("damerau_levenshtein", _damerau_levenshtein, "bigint"),
    ("jaro_similarity", _jaro_similarity, "double"),
    ("jaro_winkler_similarity", _jaro_winkler, "double"),
    ("strip_accents", _strip_accents, "string"),
    ("nfc_normalize", _nfc_normalize, "string"),
    ("parse_dirname", _parse_dirname, "string"),
    ("parse_filename", _parse_filename, "string"),
    ("parse_path", _parse_path, "array<string>"),
    ("url_encode", _url_encode, "string"),
    ("url_decode", _url_decode, "string"),
    ("gamma", _gamma, "double"),
    ("lgamma", _lgamma, "double"),
    ("signbit", _signbit, "boolean"),
]


def register_compat_udfs(spark) -> None:
    """Idempotent per-session registration of the parity UDFs."""
    for name, fn, rtype in _REGISTRY:
        spark.udf.register(name, fn, rtype)
