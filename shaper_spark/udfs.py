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

import calendar
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


def _regexp_escape(s: str | None) -> str | None:
    """DuckDB regexp_escape = RE2 QuoteMeta: escape every char except
    [A-Za-z0-9_] — exactly Python's re.escape (differential-verified
    incl. space, '-', '#', '$' and backslash doubling, r11)."""
    if s is None:
        return None
    import re as _re

    return _re.escape(s)


def _chr_unicode(n: int | None) -> str | None:
    """DuckDB chr() takes any Unicode codepoint; Spark's builtin chr
    wraps at 256 (chr(9731) = '\\x03' — silent wrong, r11 batch-16).
    Registering this name shadows the builtin for SQL text."""
    if n is None:
        return None
    try:
        return chr(int(n))
    except (ValueError, OverflowError):
        return None


def _gcd(a: int | None, b: int | None) -> int | None:
    if a is None or b is None:
        return None
    return math.gcd(int(a), int(b))


def _lcm(a: int | None, b: int | None) -> int | None:
    if a is None or b is None:
        return None
    return math.lcm(int(a), int(b))


def _nextafter(x: float | None, y: float | None) -> float | None:
    if x is None or y is None:
        return None
    return math.nextafter(x, y)


def _json_merge_patch(a: str | None, b: str | None) -> str | None:
    """RFC 7386 JSON Merge Patch, DuckDB semantics (r11): null patch
    values REMOVE keys, nested objects merge recursively, a non-object
    patch replaces the target wholesale; SQL NULL patch → NULL, SQL
    NULL target → the patch.  Variadic DuckDB calls are folded to
    nested 2-arg calls by the rewriter.  Output is compact JSON like
    DuckDB's printer — including its key ORDER: unpatched target keys
    first (original order), every patched key re-appended at the end
    in patch order, recursively (r12 JSON fuzz find; the previous
    in-place update kept patched keys at their original position)."""
    import json as _json

    if b is None:
        return None

    def merge(target, patch):
        if not isinstance(patch, dict):
            return patch
        told = target if isinstance(target, dict) else {}
        out = {k: v for k, v in told.items() if k not in patch}
        for k, v in patch.items():
            if v is None:
                continue
            out[k] = merge(told.get(k), v)
        return out

    try:
        patch = _json.loads(b)
        target = None if a is None else _json.loads(a)
    except ValueError:
        return None
    if not isinstance(target, dict):
        # DuckDB quirk (r12 JSON fuzz): a non-object TOP-LEVEL target
        # takes the patch VERBATIM — null values survive, no removal
        # (removal still applies at nested levels of a real merge).
        result = patch
    else:
        result = merge(target, patch)
    return _json.dumps(
        result, separators=(",", ":"), ensure_ascii=False
    )


def _json_type_of(v):
    if isinstance(v, bool):
        return "BOOLEAN"
    if isinstance(v, int):
        return "UBIGINT" if v >= 0 else "BIGINT"
    if isinstance(v, float):
        return "DOUBLE"
    if isinstance(v, str):
        return "VARCHAR"
    if v is None:
        return "NULL"
    if isinstance(v, dict):
        if not v:
            # DuckDB collapses an EMPTY object to "JSON" (r12 fuzz),
            # at any nesting depth
            return "JSON"
        return {k: _json_type_of(x) for k, x in v.items()}
    # list: unify the element structures like DuckDB (numeric
    # widening, object key union, incompatible → "JSON")
    elems = [_json_type_of(x) for x in v]
    if not elems:
        return ["NULL"]
    u = elems[0]
    for e in elems[1:]:
        u = _unify_structure(u, e)
    return [u]


_NUM_ORDER = {"UBIGINT": 0, "BIGINT": 1, "DOUBLE": 2}


def _unify_structure(a, b):
    if a == b:
        return a
    if a == "NULL":
        return b
    if b == "NULL":
        return a
    if isinstance(a, str) and isinstance(b, str):
        if a in _NUM_ORDER and b in _NUM_ORDER:
            return a if _NUM_ORDER[a] >= _NUM_ORDER[b] else b
        return "JSON"
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = _unify_structure(out[k], v) if k in out else v
        return out
    if isinstance(a, list) and isinstance(b, list):
        return [_unify_structure(a[0], b[0])]
    return "JSON"


def _json_type(j: str | None) -> str | None:
    """DuckDB ``json_type``: the top-level JSON type name — OBJECT,
    ARRAY, VARCHAR, UBIGINT/BIGINT (by sign), DOUBLE, BOOLEAN, NULL.
    The 2-arg path form is rewritten to
    ``json_type(get_json_object(…))`` before this runs (r11)."""
    import json as _json

    if j is None:
        return None
    try:
        v = _json.loads(j)
    except ValueError:
        # a bare extracted string (get_json_object unquotes) — DuckDB
        # would have typed the original scalar; treat as VARCHAR
        return "VARCHAR"
    if isinstance(v, dict):
        return "OBJECT"
    if isinstance(v, list):
        return "ARRAY"
    t = _json_type_of(v)
    return t if isinstance(t, str) else "JSON"


def _duckdb_factorial(n: int | None) -> int | None:
    """DuckDB ``factorial``/postfix ``!`` (r13): n < 2 (negatives
    included) → 1; result is HUGEINT there, DECIMAL(38,0) here — both
    overflow at 34! ('Out of Range'), pinned vs DuckDB 1.0 live."""
    if n is None:
        return None
    import math as _math

    n = int(n)
    v = 1 if n < 2 else _math.factorial(n)
    if v >= 10**38:
        raise ValueError("Out of Range Error: Value out of range")
    from decimal import Decimal

    return Decimal(v)  # DecimalType needs Decimal, not int


def _json_walk(j: str | None, p: str | None):
    """Parse ``j`` and walk a DuckDB-style path ``p``: '$'-prefixed
    JSONPath ('.key' / '[idx]'), '/'-separated JSON pointer, or a
    bare single KEY (DuckDB treats 'c.d' as one key — pinned live).
    Returns (found, value)."""
    import json as _json
    import re as _re

    if j is None or p is None:
        return False, None
    try:
        v = _json.loads(j)
    except ValueError:
        return False, None

    def step(val, key: str, idx: str):
        if key:
            if isinstance(val, dict) and key in val:
                return True, val[key]
            if isinstance(val, list) and key.isdigit():
                i = int(key)
                if 0 <= i < len(val):
                    return True, val[i]
            return False, None
        i = int(idx)
        if isinstance(val, list) and 0 <= i < len(val):
            return True, val[i]
        return False, None

    if p.startswith("$"):
        segs = _re.findall(r"\.([^.\[\]]+)|\[(\d+)\]", p[1:])
    elif p.startswith("/"):
        segs = [(k, "") for k in p[1:].split("/") if k != ""]
    else:
        segs = [(p, "")]
    for key, idx in segs:
        ok, v = step(v, key, idx)
        if not ok:
            return False, None
    return True, v


def _json_type2(j: str | None, p: str | None) -> str | None:
    """DuckDB 2-arg ``json_type(json, path)`` (r13 fuzz find): walk
    the path in Python so a JSON ``null`` AT the path returns the
    string ``'NULL'`` while a MISSING path returns SQL NULL — the
    distinction ``get_json_object`` erases (it yields SQL NULL for
    both)."""
    found, v = _json_walk(j, p)
    if not found:
        return None
    if v is None:
        return "NULL"
    if isinstance(v, dict):
        return "OBJECT"
    if isinstance(v, list):
        return "ARRAY"
    t = _json_type_of(v)
    return t if isinstance(t, str) else "JSON"


def _json_extract_json(j: str | None, p: str | None) -> str | None:
    """DuckDB ``json_extract``/``->`` (JSON-typed result, r13 fuzz
    find): a string value keeps its JSON quotes (``'"x"'``) where
    ``get_json_object`` unquotes; compact object/array rendering;
    JSON null at the path AND a missing path both yield SQL NULL
    (pinned against DuckDB 1.0.0 live)."""
    import json as _json

    found, v = _json_walk(j, p)
    if not found or v is None:
        return None
    return _json.dumps(v, separators=(",", ":"), ensure_ascii=False)


def _json_extract_text(j: str | None, p: str | None) -> str | None:
    """DuckDB ``json_extract_string``/``json_extract_path_text``
    (r13): like :func:`_json_extract_json` but a string value comes
    back UNQUOTED; supports the bare-key and JSON-pointer paths
    ``get_json_object`` cannot resolve (pinned live)."""
    import json as _json

    found, v = _json_walk(j, p)
    if not found or v is None:
        return None
    if isinstance(v, str):
        return v
    return _json.dumps(v, separators=(",", ":"), ensure_ascii=False)


def _json_contains(h: str | None, n: str | None) -> bool | None:
    """DuckDB ``json_contains(haystack, needle)``: structural
    membership anywhere in the haystack (r11)."""
    import json as _json

    if h is None or n is None:
        return None
    try:
        hay = _json.loads(h)
        needle = _json.loads(n)
    except ValueError:
        return None

    def walk(v) -> bool:
        if v == needle:
            return True
        if isinstance(v, dict):
            return any(walk(x) for x in v.values())
        if isinstance(v, list):
            return any(walk(x) for x in v)
        return False

    return walk(hay)


def _json_structure(j: str | None) -> str | None:
    """DuckDB ``json_structure``: the value's shape with DuckDB type
    names in place of scalars — ``'{"a":1,"b":[1,2]}'`` →
    ``'{"a":"UBIGINT","b":["UBIGINT"]}'``; arrays unify their element
    structures (numeric widening, object key union), incompatible
    elements collapse to ``"JSON"`` (r11, differential-tested)."""
    import json as _json

    if j is None:
        return None
    try:
        v = _json.loads(j)
    except ValueError:
        return None
    return _json.dumps(
        _json_type_of(v), separators=(",", ":"), ensure_ascii=False
    )


def _hamming(a: str | None, b: str | None) -> int | None:
    """DuckDB hamming/mismatches: count of differing positions;
    errors on unequal lengths like DuckDB (loud, not silent)."""
    if a is None or b is None:
        return None
    if len(a) != len(b):
        raise ValueError("hamming: strings must be of equal length")
    return sum(1 for x, y in zip(a, b) if x != y)


def _parse_dirpath(s: str | None) -> str | None:
    """Path minus the final component (DuckDB parse_dirpath,
    default '/' separator)."""
    if s is None:
        return None
    trimmed = s.rstrip("/")
    if "/" not in trimmed:
        return ""
    head = trimmed.rsplit("/", 1)[0]
    return head if head else "/"


_BAR_EIGHTHS = " ▏▎▍▌▋▊▉"


def _bar(x, lo, hi, width=80):
    """DuckDB bar(): (x-lo)/(hi-lo)·width as full blocks plus an
    eighth-width partial block, right-padded with spaces to ``width``
    UTF-8 BYTES (a block is 3 bytes — DuckDB pads on byte length, a
    quirk pinned against DuckDB 1.0 outputs)."""
    if x is None or lo is None or hi is None or width is None:
        return None
    lo, hi, width = float(lo), float(hi), float(width)
    if hi <= lo or width <= 0:
        return ""
    frac = min(max((float(x) - lo) / (hi - lo), 0.0), 1.0)
    w = frac * width
    full = int(w)
    eighth = int((w - full) * 8 + 0.5)
    if eighth >= 8:
        full += 1
        eighth = 0
    out = "█" * full + (_BAR_EIGHTHS[eighth] if eighth else "")
    pad = int(width) - len(out.encode("utf-8"))
    return out + " " * max(0, pad)


def _length_grapheme(s):
    """Extended-grapheme-cluster count: combining marks, ZWJ
    sequences, variation selectors, and regional-indicator pairs
    attach to the previous cluster (approximates DuckDB's ICU
    clustering; exact on the precomposed/emoji text probed)."""
    if s is None:
        return None
    import unicodedata

    n = 0
    prev_zwj = False
    prev_ri = False
    for ch in s:
        if unicodedata.combining(ch) or ch in "\ufe0e\ufe0f":
            continue
        if ch == "\u200d":
            prev_zwj = True
            continue
        is_ri = 0x1F1E6 <= ord(ch) <= 0x1F1FF
        if prev_zwj or (is_ri and prev_ri):
            prev_zwj = False
            prev_ri = False
            continue
        n += 1
        prev_zwj = False
        prev_ri = is_ri
    return n


_TYPENAME_SCALARS = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "bigint": "BIGINT",
    "string": "VARCHAR",
    "varchar": "VARCHAR",
    "double": "DOUBLE",
    "float": "FLOAT",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "binary": "BLOB",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "void": '"NULL"',
    "null": '"NULL"',
    "interval": "INTERVAL",
    "interval day to second": "INTERVAL",
    "interval year to month": "INTERVAL",
}


def _duckdb_age(a, b):
    """DuckDB ``age(later, earlier)`` → the symbolic-interval VARCHAR
    rendering ('2 years 1 month 26 days 02:30:00').  Algorithm matches
    DuckDB (differential-probed r12): subtract the year/month/day/time
    fields, borrow time from days (86400 s), days from the EARLIER
    timestamp's month length, months from years; a later < earlier
    pair negates every component.  Rendering: plural per |component|,
    zero components omitted, time omitted when zero unless everything
    is zero ('00:00:00'), fractional seconds with trailing zeros
    trimmed.  Divergence (documented): DuckDB's age returns INTERVAL;
    this returns its VARCHAR rendering (Spark has no mixed
    month-day-time interval in SQL results)."""
    if a is None or b is None:
        return None
    sign = 1
    if a < b:
        a, b = b, a
        sign = -1
    y = a.year - b.year
    m = a.month - b.month
    d = a.day - b.day
    us = (
        (a.hour * 3600 + a.minute * 60 + a.second) * 1_000_000
        + a.microsecond
        - (b.hour * 3600 + b.minute * 60 + b.second) * 1_000_000
        - b.microsecond
    )
    if us < 0:
        us += 86_400_000_000
        d -= 1
    if d < 0:
        d += calendar.monthrange(b.year, b.month)[1]
        m -= 1
    if m < 0:
        m += 12
        y -= 1
    parts = []
    for v, unit in ((y, "year"), (m, "month"), (d, "day")):
        if v:
            parts.append(
                f"{sign * v} {unit}" + ("s" if abs(v) != 1 else "")
            )
    if us or not parts:
        h, rem = divmod(us, 3_600_000_000)
        mm, rem = divmod(rem, 60_000_000)
        ss, micro = divmod(rem, 1_000_000)
        t = f"{h:02d}:{mm:02d}:{ss:02d}"
        if micro:
            t += "." + f"{micro:06d}".rstrip("0")
        parts.append(("-" if sign < 0 else "") + t)
    return " ".join(parts)


def _duckdb_strptime(s, fmt):
    """strptime fallback for formats the JVM parser rejects (day-of-
    week codes %a/%A are format-only in Spark's corrected parser).
    Python's C-locale strptime matches DuckDB's English names; the
    no-pad '-' modifiers are dropped (Python parses unpadded digits
    with the plain directives anyway).  Raises on a mismatch, like
    DuckDB's strptime."""
    if s is None or fmt is None:
        return None
    import datetime as _dt
    import re as _re

    return _dt.datetime.strptime(s, _re.sub(r"%-(\w)", r"%\1", fmt))


def _duckdb_try_strptime(s, fmt):
    try:
        return _duckdb_strptime(s, fmt)
    except (ValueError, TypeError):
        return None


def _duckdb_typename(t):
    """Spark typeof() spelling → the DuckDB spelling (typeof parity;
    nested array/map/struct recurse, unknown names upper-case)."""
    if t is None:
        return None
    t = t.strip()
    low = t.lower()
    if low in _TYPENAME_SCALARS:
        return _TYPENAME_SCALARS[low]
    if low.startswith("decimal(") and low.endswith(")"):
        return "DECIMAL" + t[7:]
    if low.startswith("array<") and low.endswith(">"):
        return _duckdb_typename(t[6:-1]) + "[]"
    if low.startswith("map<") and low.endswith(">"):
        inner = t[4:-1]
        depth = 0
        for i, c in enumerate(inner):
            if c in "<(":
                depth += 1
            elif c in ">)":
                depth -= 1
            elif c == "," and depth == 0:
                return (
                    "MAP("
                    + _duckdb_typename(inner[:i])
                    + ", "
                    + _duckdb_typename(inner[i + 1 :])
                    + ")"
                )
    if low.startswith("struct<") and low.endswith(">"):
        inner = t[7:-1]
        parts = []
        depth = 0
        last = 0
        # '(' / ')' depth counts too: DECIMAL(10,2) field types carry
        # a comma that must not split the struct field list.
        for i, c in enumerate(inner + ","):
            if c in "<(":
                depth += 1
            elif c in ">)":
                depth -= 1
            elif c == "," and depth == 0:
                field = inner[last:i] if i <= len(inner) else inner[last:]
                last = i + 1
                if ":" in field:
                    name, ft = field.split(":", 1)
                    parts.append(
                        name.strip() + " " + _duckdb_typename(ft)
                    )
        return "STRUCT(" + ", ".join(parts) + ")"
    return t.upper()


_REGISTRY = [
    ("bar", _bar, "string"),
    ("length_grapheme", _length_grapheme, "bigint"),
    ("duckdb_typename", _duckdb_typename, "string"),
    ("duckdb_age", _duckdb_age, "string"),
    ("duckdb_strptime", _duckdb_strptime, "timestamp"),
    ("duckdb_try_strptime", _duckdb_try_strptime, "timestamp"),
    ("damerau_levenshtein", _damerau_levenshtein, "bigint"),
    ("jaro_similarity", _jaro_similarity, "double"),
    ("jaro_winkler_similarity", _jaro_winkler, "double"),
    ("strip_accents", _strip_accents, "string"),
    ("nfc_normalize", _nfc_normalize, "string"),
    ("parse_dirname", _parse_dirname, "string"),
    ("parse_dirpath", _parse_dirpath, "string"),
    ("hamming", _hamming, "bigint"),
    ("mismatches", _hamming, "bigint"),
    ("parse_filename", _parse_filename, "string"),
    ("parse_path", _parse_path, "array<string>"),
    ("url_encode", _url_encode, "string"),
    ("url_decode", _url_decode, "string"),
    ("gamma", _gamma, "double"),
    ("lgamma", _lgamma, "double"),
    ("signbit", _signbit, "boolean"),
    ("json_merge_patch", _json_merge_patch, "string"),
    ("json_structure", _json_structure, "string"),
    ("json_type", _json_type, "string"),
    ("json_type2", _json_type2, "string"),
    ("json_extract_json", _json_extract_json, "string"),
    ("duckdb_factorial", _duckdb_factorial, "decimal(38,0)"),
    ("json_extract_text", _json_extract_text, "string"),
    ("json_contains", _json_contains, "boolean"),
    ("regexp_escape", _regexp_escape, "string"),
    ("chr", _chr_unicode, "string"),
    ("gcd", _gcd, "bigint"),
    ("lcm", _lcm, "bigint"),
    ("nextafter", _nextafter, "double"),
]


def register_compat_udfs(spark) -> None:
    """Idempotent per-session registration of the parity UDFs."""
    for name, fn, rtype in _REGISTRY:
        spark.udf.register(name, fn, rtype)
    # mad(x) = median(|x - median(x)|) — DuckDB's median absolute
    # deviation.  A two-pass aggregate no Spark expression composes
    # (the inner median is per-GROUP), so it registers as an
    # Arrow-batched grouped-agg pandas UDF: SQL `mad(x)` works in any
    # GROUP BY; NULLs skipped like the DuckDB aggregate (r11).
    try:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _mad(v):
            s = pd.to_numeric(v, errors="coerce").dropna()
            if s.empty:
                return None
            return float((s - s.median()).abs().median())

        # annotation OBJECTS (not strings): pandas_udf resolves type
        # hints via get_type_hints in the module globals, where a
        # locally-imported pd would not exist
        _mad.__annotations__ = {"v": pd.Series, "return": float}
        spark.udf.register("mad", pandas_udf(_mad, "double"))
    except Exception:
        # pandas/arrow unavailable: the scalar registry above still
        # loads; mad() stays an unknown function
        pass
