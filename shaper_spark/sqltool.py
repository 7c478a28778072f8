"""SQL text tooling: comment stripping, statement splitting, escaping,
and the read-only statement gate.

Semantics mirror the reference implementation (behavior parity, new code):
  - strip comments:   /root/reference/server/util/util.go:39-94
  - split statements: /root/reference/server/util/util.go:97-165
  - escaping:         /root/reference/server/util/util.go:21-37
  - statement gate:   /root/reference/server/core/sql_validation.go:93-275

All functions are pure Python (no Spark dependency) so they can run on the
driver for any number of dashboards without touching the cluster.
"""

from __future__ import annotations

import re

__all__ = [
    "strip_sql_comments",
    "split_sql_queries",
    "escape_sql_string",
    "escape_sql_identifier",
    "is_allowed_statement",
    "is_allowed_task_statement",
    "is_side_effect",
    "SqlSplitError",
]


class SqlSplitError(ValueError):
    """Raised when a SQL script has unbalanced quotes."""


def escape_sql_string(value: str) -> str:
    """Escape a string for embedding in a single-quoted SQL literal."""
    out = value.replace("'", "''")
    out = out.replace("\x00", "")
    out = out.replace("\n", " ").replace("\r", " ")
    out = out.replace("\x1a", "")
    return out


def escape_sql_identifier(value: str) -> str:
    """Escape a string for embedding in a double-quoted SQL identifier."""
    out = value.replace('"', '""')
    out = out.replace("\x00", "")
    out = out.replace("\n", " ").replace("\r", " ")
    out = out.replace("\x1a", "")
    return out


def strip_sql_comments(sql: str) -> str:
    """Remove ``--`` line comments, quote-aware.

    Text inside single- or double-quoted regions is preserved verbatim,
    including doubled-quote escapes. The newline terminating a comment is
    kept so statement line numbers stay stable.
    """
    out: list[str] = []
    in_single = False
    in_double = False
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'" and not in_double:
            if i + 1 < n and sql[i + 1] == "'":
                out.append("''")
                i += 2
                continue
            in_single = not in_single
            out.append(c)
            i += 1
            continue
        if c == '"' and not in_single:
            if i + 1 < n and sql[i + 1] == '"':
                out.append('""')
                i += 2
                continue
            in_double = not in_double
            out.append(c)
            i += 1
            continue
        if c == "-" and not in_single and not in_double:
            if i + 1 < n and sql[i + 1] == "-":
                while i < n and sql[i] != "\n":
                    i += 1
                if i < n:
                    out.append("\n")
                    i += 1
                continue
        out.append(c)
        i += 1
    return "".join(out)


def split_sql_queries(sql: str) -> list[str]:
    """Split a script on ``;`` outside quotes; raise on unclosed quotes.

    Each returned statement is stripped of surrounding whitespace and its
    trailing semicolon; empty statements are dropped.
    """
    queries: list[str] = []
    cur: list[str] = []
    in_single = False
    in_double = False
    line = 1
    quote_start_line = 0
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        cur.append(c)
        if c == "\n":
            line += 1
        if c == "'" and not in_double:
            if i + 1 < n and sql[i + 1] == "'":
                cur.append("'")
                i += 2
                continue
            if not in_single:
                quote_start_line = line
            in_single = not in_single
            i += 1
            continue
        if c == '"' and not in_single:
            if i + 1 < n and sql[i + 1] == '"':
                cur.append('"')
                i += 2
                continue
            if not in_double:
                quote_start_line = line
            in_double = not in_double
            i += 1
            continue
        if c == ";" and not in_single and not in_double:
            stmt = "".join(cur).strip()[:-1].strip()  # drop the semicolon
            if stmt:
                queries.append(stmt)
            cur = []
        i += 1

    if in_single:
        raise SqlSplitError(
            f"unclosed single quote starting in line {quote_start_line + 1}"
        )
    if in_double:
        raise SqlSplitError(
            f"unclosed double quote starting in line {quote_start_line + 1}"
        )
    last = "".join(cur).strip()
    if last:
        queries.append(last)
    return queries


# ---------------------------------------------------------------------------
# Statement gate
# ---------------------------------------------------------------------------

# Statements executed only for their side effects (hidden from dashboard
# output). Matched as whole-word prefixes, case-insensitive.
SIDE_EFFECT_STATEMENTS: list[list[str]] = [
    ["USE"],
    ["SET", "VARIABLE"],
    ["BEGIN"],
    ["COMMIT"],
    ["ROLLBACK"],
    ["ABORT"],
    ["CALL"],
    ["RESET", "VARIABLE"],
    # DuckDB secret store (engine-level credentials; secrets.py maps
    # them to Hadoop/s3a confs)
    ["CREATE", "SECRET"],
    ["CREATE", "OR", "REPLACE", "SECRET"],
    ["CREATE", "PERSISTENT", "SECRET"],
    ["CREATE", "TEMPORARY", "SECRET"],
    ["CREATE", "TEMP", "SECRET"],
    ["DROP", "SECRET"],
    ["DROP", "PERSISTENT", "SECRET"],
    ["DROP", "TEMPORARY", "SECRET"],
    ["DROP", "TEMP", "SECRET"],
]
# CREATE TEMP/TEMPORARY TABLE/VIEW/MACRO/FUNCTION with optional OR REPLACE /
# IF NOT EXISTS combinations.
for _temp in ("TEMPORARY", "TEMP"):
    for _obj in ("TABLE", "VIEW"):
        SIDE_EFFECT_STATEMENTS.append(["CREATE", _temp, _obj])
        SIDE_EFFECT_STATEMENTS.append(["CREATE", "OR", "REPLACE", _temp, _obj])
    for _obj in ("MACRO", "FUNCTION"):
        SIDE_EFFECT_STATEMENTS.append(["CREATE", _temp, _obj])
        SIDE_EFFECT_STATEMENTS.append(
            ["CREATE", _temp, _obj, "IF", "NOT", "EXISTS"]
        )
        SIDE_EFFECT_STATEMENTS.append(["CREATE", "OR", "REPLACE", _temp, _obj])

ALLOWED_READ_STATEMENTS: list[list[str]] = [
    ["SELECT"],
    ["FROM"],
    ["VALUES"],
    ["SUMMARIZE"],
    ["DESC"],
    ["DESCRIBE"],
    ["SHOW", "TABLES"],
    ["SHOW", "ALL", "TABLES"],
    ["PIVOT"],
    ["UNPIVOT"],
    ["EXPLAIN"],
]

DISALLOWED_TASK_STATEMENTS: list[list[str]] = [["PRAGMA"]]

_WORD_BOUNDARY = (" ", "\t", "\n", "\r", "\x0b", "\x0c", "(", ";", ",")


def _matches_prefix(upper_sql: str, prefix: list[str]) -> bool:
    sub = upper_sql
    for word in prefix:
        if not sub.startswith(word):
            return False
        after = sub[len(word):]
        if after and not (after[0] in _WORD_BOUNDARY or after[0].isspace()):
            return False
        sub = after.strip()
    return True


def is_side_effect(sql: str, *, memory_mode: bool = False) -> bool:
    upper = sql.strip().upper()
    if memory_mode and upper.startswith("ATTACH"):
        return True
    return any(_matches_prefix(upper, s) for s in SIDE_EFFECT_STATEMENTS)


def _find_closing_paren(sql: str, start: int) -> int:
    in_single = False
    in_double = False
    depth = 0
    i = start
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'" and not in_double:
            if i + 1 < n and sql[i + 1] == "'":
                i += 2
                continue
            in_single = not in_single
        elif c == '"' and not in_single:
            if i + 1 < n and sql[i + 1] == '"':
                i += 2
                continue
            in_double = not in_double
        elif not in_single and not in_double:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    return i
        i += 1
    raise SqlSplitError("unbalanced parentheses")


_IDENT_RE = re.compile(r'[A-Za-z_][A-Za-z0-9_$]*|"(?:[^"]|"")+"')


def _skip_identifier(sql: str, pos: int) -> int:
    m = _IDENT_RE.match(sql, pos)
    if not m:
        raise SqlSplitError(f"expected identifier at position {pos}")
    return m.end()


def split_with_statement(sql: str) -> tuple[str, list[str]]:
    """Split ``WITH [RECURSIVE] name [cols] AS (...), ... <main>`` into
    (main_query, [cte_bodies])."""
    upper = sql.upper()
    if not upper.startswith("WITH"):
        raise SqlSplitError("not a WITH statement")
    pos = 4
    rest_upper = upper[pos:].lstrip()
    if rest_upper.startswith("RECURSIVE"):
        pos = upper.index("RECURSIVE", pos) + len("RECURSIVE")

    ctes: list[str] = []
    n = len(sql)
    while True:
        while pos < n and sql[pos].isspace():
            pos += 1
        if pos >= n:
            raise SqlSplitError("unexpected end of WITH statement")
        pos = _skip_identifier(sql, pos)
        while pos < n and sql[pos].isspace():
            pos += 1
        if pos < n and sql[pos] == "(":
            pos = _find_closing_paren(sql, pos) + 1
        while pos < n and sql[pos].isspace():
            pos += 1
        if not sql[pos:].upper().startswith("AS"):
            raise SqlSplitError("missing AS in WITH clause")
        pos += 2
        # Optional MATERIALIZED / NOT MATERIALIZED hint.
        while pos < n and sql[pos].isspace():
            pos += 1
        for hint in ("NOT MATERIALIZED", "MATERIALIZED"):
            if sql[pos:].upper().startswith(hint):
                pos += len(hint)
                while pos < n and sql[pos].isspace():
                    pos += 1
                break
        if pos >= n or sql[pos] != "(":
            raise SqlSplitError("missing ( after AS in WITH clause")
        end = _find_closing_paren(sql, pos)
        ctes.append(sql[pos + 1 : end])
        pos = end + 1
        while pos < n and sql[pos].isspace():
            pos += 1
        if pos >= n:
            raise SqlSplitError("unexpected end after CTE")
        if sql[pos] == ",":
            pos += 1
            continue
        return sql[pos:], ctes


def _split_parenthesized(sql: str) -> tuple[str, str]:
    sql = sql.strip()
    if not sql.startswith("("):
        raise SqlSplitError("not a parenthesized statement")
    end = _find_closing_paren(sql, 0)
    return sql[1:end], sql[end + 1 :]


def _check_compound(sql: str, check) -> bool | None:
    """Shared WITH / parenthesized / set-op recursion for both gates.

    Returns True/False when this layer decides, or None when the caller
    should apply its own leaf rules.
    """
    sql = sql.strip()
    if sql == "":
        return True
    upper = sql.upper()

    if upper.startswith("WITH"):
        try:
            remaining, ctes = split_with_statement(sql)
        except SqlSplitError:
            return False
        return all(check(c) for c in ctes) and check(remaining)

    if upper.startswith("("):
        try:
            inner, remaining = _split_parenthesized(sql)
        except SqlSplitError:
            return False
        if not check(inner):
            return False
        remaining = remaining.strip()
        if remaining == "":
            return True
        rem_upper = remaining.upper()
        for op in ("UNION", "INTERSECT", "EXCEPT"):
            if rem_upper.startswith(op):
                rest = remaining[len(op):].strip()
                rest_upper = rest.upper()
                if rest_upper.startswith("ALL"):
                    rest = rest[3:].strip()
                elif rest_upper.startswith("DISTINCT"):
                    rest = rest[len("DISTINCT"):].strip()
                return check(rest)
        if rem_upper.startswith(("ORDER", "LIMIT", "OFFSET", "FETCH")):
            return True
        return False

    return None


def is_allowed_statement(sql: str, *, memory_mode: bool = False) -> bool:
    """Read-only allowlist used for dashboard statements."""

    def check(s: str) -> bool:
        return is_allowed_statement(s, memory_mode=memory_mode)

    decided = _check_compound(sql, check)
    if decided is not None:
        return decided

    sql = sql.strip()
    upper = sql.upper()
    if is_side_effect(sql, memory_mode=memory_mode):
        return True
    for stmt in ALLOWED_READ_STATEMENTS:
        if _matches_prefix(upper, stmt):
            if stmt[0] == "EXPLAIN":
                rest = sql[len("EXPLAIN"):].strip()
                if rest == "":
                    return True
                if rest.upper().startswith("ANALYZE"):
                    rest = rest[len("ANALYZE"):].strip()
                if rest == "":
                    return True
                return check(rest)
            return True
    return False


def is_allowed_task_statement(sql: str) -> bool:
    """Deny-list gate for task statements (full DDL/DML allowed)."""
    decided = _check_compound(sql, is_allowed_task_statement)
    if decided is not None:
        return decided

    sql = sql.strip()
    upper = sql.upper()
    for stmt in DISALLOWED_TASK_STATEMENTS:
        if _matches_prefix(upper, stmt):
            return False
    if upper.startswith(("INSTALL", "LOAD", "ATTACH", "DETACH")):
        return True
    if _matches_prefix(upper, ["CREATE", "SECRET"]):
        return True
    if upper.startswith("SET"):
        return _matches_prefix(upper, ["SET", "VARIABLE"])
    if upper.startswith("RESET"):
        return _matches_prefix(upper, ["RESET", "VARIABLE"])
    return True
