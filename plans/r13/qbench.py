"""Focused per-query bench: spark steady (min of N consecutive fresh
executions, plancache bumped before each) + DuckDB reps on the oracle
SQL, same session — the r11 ruled-gate protocol on a chosen subset.

Usage: python plans/r13/qbench.py name [name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_QBENCH_REPS (default 4).
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: qbench.py name [name ...]", file=sys.stderr)
        sys.exit(2)
    import __spark_entry__ as entrymod
    from shaper_spark import plancache
    from shaper_spark.session import get_spark, register_sf_tables

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps_n = int(os.environ.get("SPARK_GRAFT_QBENCH_REPS", "4"))
    spark = get_spark("qbench")
    register_sf_tables(spark, sf_dir)
    spark.sql("SELECT count(*) FROM region").collect()
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(json.dumps({"query": name, "err": "missing"}))
            continue
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        reps = []
        for _ in range(reps_n):
            plancache.bump()
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            reps.append(round(time.perf_counter() - t0, 4))
        dreps = []
        sql = oracles.get(name)
        if sql:
            for _ in range(5):
                t0 = time.perf_counter()
                try:
                    con.execute(sql).fetchall()
                except Exception:
                    dreps = []
                    break
                dreps.append(round(time.perf_counter() - t0, 4))
                if dreps[-1] > 5.0:
                    break
        med3 = statistics.median(sorted(dreps[:3])) if dreps else None
        steady = min(reps)
        print(
            json.dumps(
                {
                    "query": name,
                    "spark_reps": reps,
                    "spark_steady_min": steady,
                    "duck_reps": dreps,
                    "duck_med3": med3,
                    "ratio": (
                        round(steady / med3, 3) if med3 else None
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
