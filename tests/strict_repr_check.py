"""Strict repr-level differential: like tests/oracle_check.py, but
instead of normalizing values (round-9, -0.0→0, Decimal→float) it
compares the SORTED value reprs verbatim — a superset of whatever
canonicalization the external driver's value-hash applies, so any
engine-representation divergence (negative zero, Decimal scale, float
formatting) surfaces here before the driver flags it.

Usage: python tests/strict_repr_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _key(cols, row):
    return tuple(str(v) for v in row)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from shaper_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(
        "strict_repr", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            cur = con.execute(sql)
            dcols = [d[0] for d in cur.description]
            drows = [tuple(r) for r in cur.fetchall()]
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        # driver-style: sort columns by name, then sort row tuples
        sorder = sorted(range(len(scols)), key=lambda i: scols[i])
        dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
        s = sorted(
            tuple(repr(r[i]) for i in sorder) for r in srows
        )
        d = sorted(
            tuple(repr(r[i]) for i in dorder) for r in drows
        )
        if sorted(scols) != sorted(dcols):
            print(f"COLS {name}: {sorted(scols)} vs {sorted(dcols)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"ROWS {name}: {len(s)} vs {len(d)}")
            failures += 1
            continue
        diffs = [(a, b) for a, b in zip(s, d) if a != b]
        if diffs:
            print(f"DIFF {name}: {len(diffs)} repr-different rows; first:")
            print(f"  spark: {diffs[0][0]}")
            print(f"  duck : {diffs[0][1]}")
            failures += 1
        else:
            print(f"ok   {name}: {len(s)} rows repr-identical")
    print(f"\n{failures} repr failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
