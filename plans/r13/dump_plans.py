"""Dump .explain("formatted") for a set of declared queries.

Usage: python plans/r13/dump_plans.py <suffix> [name ...]
Writes plans/r13/<query>_<suffix>.txt for each query (default: the
gate-relevant set below).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

DEFAULT = [
    # headline heavies + biggest fresh contributors
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "embedding_neardup",
    "q5_region_revenue",
    "q3_shipping_priority",
    "events_sessionize",
    "text_token_stats",
    "text_quality",
    # gate-eligible with ratio > 1.2 (latest committed BENCH_DETAIL)
    "dsir_weights",
    "dsir_select",
    "remove_dup_spans",
    "boilerplate_grams",
    "pipeline_stage_counts",
    "dup_span_stats",
    "dedup_incremental_report",
    "minhash_est_error",
    "decontam_ngrams",
    "dedup_sig_incremental",
    "semdedup_report",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    import __spark_entry__ as entrymod
    from shaper_spark.session import get_spark, register_sf_tables

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plandump")
    register_sf_tables(spark, sf_dir)
    queries = entrymod.queries()
    outdir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"skip {name}: not in registry")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            plan = f"ERROR: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()
