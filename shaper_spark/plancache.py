"""Analyzed-plan cache for repeated statement text.

A dashboard server re-serves the SAME SQL text constantly (every
render, every widget refresh re-runs the dashboard's statements with
identical or identically-substituted text).  Spark's per-query cost on
a warm session decomposes into (a) analysis + optimization + codegen of
the plan and (b) actual execution; for the short statements a dashboard
is made of, (a) dominates — measured 0.30 s fresh vs 0.045 s re-running
an already-resolved DataFrame (README §perf).  DuckDB's parse+plan is
sub-millisecond, so an engine that re-analyzes every render pays a
~0.25 s tax per statement that the reference engine does not.

This module memoizes the *analyzed DataFrame* (the lazy plan — NOT the
result): a cache hit still runs every job, shuffle, and scan when the
caller collects; only the redundant re-analysis is skipped.  That makes
staleness the ONLY hazard: an analyzed plan pins resolved relations
(and their file listings), so any catalog or data mutation must
invalidate.  ``bump()`` is called from every mutation path — side-effect
statements (CREATE/USE/SET/ATTACH…), DML, ingest appends, snapshot
restore, and (re-)registration of the sf tables — and flushes the whole
cache; correctness never depends on a hit.

Reference parity: the reference keeps one DuckDB instance hot and lets
DuckDB's own (sub-ms) planner re-plan each time — this cache is the
Spark-shaped equivalent of "keep the engine warm".
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Any

__all__ = ["analyzed", "bump", "stats", "clear"]

_LOCK = threading.RLock()
_CACHE: "OrderedDict[tuple[int, str], Any]" = OrderedDict()
_CAPACITY = 256
_HITS = 0
_MISSES = 0
_GEN = 0


def analyzed(spark, sql_text: str):
    """``spark.sql(sql_text)`` with the analyzed DataFrame memoized per
    (session, statement text).  The returned DataFrame is lazy — every
    collect/foreach on it executes fully; only analysis is reused."""
    global _HITS, _MISSES
    key = (id(spark), sql_text)
    with _LOCK:
        hit = _CACHE.get(key)
        if hit is not None and hit[0] is spark:
            _CACHE.move_to_end(key)
            _HITS += 1
            return hit[1]
    df = spark.sql(sql_text)
    with _LOCK:
        _MISSES += 1
        # the session object rides along so an id()-reuse after GC can
        # never alias a dead session's plans (identity check above)
        _CACHE[key] = (spark, df)
        while len(_CACHE) > _CAPACITY:
            _CACHE.popitem(last=False)
    return df


def bump() -> None:
    """Invalidate everything — call after ANY catalog or data mutation
    (DDL/DML, temp-view (re)registration, ingest append, ATTACH,
    snapshot restore).  Coarse by design: mutations are rare next to
    renders, and a full flush is provably safe."""
    global _GEN
    with _LOCK:
        _GEN += 1
        _CACHE.clear()


def clear() -> None:
    bump()


def stats() -> dict[str, int]:
    with _LOCK:
        return {
            "hits": _HITS,
            "misses": _MISSES,
            "size": len(_CACHE),
            "generation": _GEN,
        }
