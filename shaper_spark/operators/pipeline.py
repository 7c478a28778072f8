"""End-to-end training-corpus build: the §2C operators composed into the
standard pretraining funnel, with a stage-count report that replays in
ANSI SQL (every stage is built from oracle-replayable primitives).

Funnel (the C4/RefinedWeb shape):

  0_raw                 input documents
  1_normalized_dedup    exact dedup after lowercase/punct/space
                        normalization (dedup_exact_normalized's min-by
                        winner rule)
  2_quality             Gopher §A1.1 composite filter keeps
                        (gopher_quality_filter)
  3_train_split         leakage-safe hash split, train side
                        (hash_split, 90/10)
  4_decontaminated      train docs sharing an 8-gram with the held-out
                        test split dropped (the ngram_decontaminate
                        overlap rule, reduced to a semi-join because
                        only membership matters for the drop)

Scale shape: every funnel decision is carried as a NARROW id set, never
a persisted copy of the corpus — the winner rule is one min-by
aggregate producing ids, the Gopher verdict is (id, keep), the split is
a pure hash expression over ids, and contamination is a LEFT SEMI join
on the positional 8-gram stream (multiplicity is irrelevant to a semi
join, so no per-doc distinct pass and no (eval, train) pair blowup).
Only the two reused id frames persist (kilobytes per million docs); the
five counts run as ONE job (a union of single-row aggregates, so Spark
shares scans and runs independent branches concurrently), are collected
INSIDE the operator — five ints, the only driver materialization — and
both persists are released before returning, so a long-lived server
never accumulates cached blocks across calls.

Broadcast story (measured at sf0.1, A/B'd in the bench environment):
- the TEST split's ids and its 8-gram projection broadcast
  (``broadcast_eval=True``): in a decontamination the held-out side is
  the eval/benchmark set — orders of magnitude smaller than train by
  construction.  At a scale where the eval gram stream outgrows the
  broadcast threshold, pass ``broadcast_eval=False`` and the semi join
  reverts to a keyed shuffle (same plan class as dedup's posting
  joins).
- the gram path does NOT pre-repartition (the old spread_for_compute
  call): the explode's output flows straight into a join that
  redistributes anyway, so the extra exchange bought parallelism the
  join shuffle already provides — removing it and broadcasting the
  eval side took the report from 2.4 s to ~1.5 s at sf0.1.
- r7 measured-and-rejected (FLOOR.md has the table): single-scan
  gram variants — shingle once with the split label riding, then
  (a) repartition("shingle") + ReuseExchange for both sides, or
  (b) persist the gram stream and branch — and 16-byte
  unhex(md5(gram)) join keys. All slower (2.0–2.9 s vs 1.84–1.98 s
  interleaved, identical counts): the two gram branches explode
  DISJOINT row sets (train/test partition the corpus), so "one scan"
  saves only a page-cached parquet re-read while adding a
  full-corpus gram shuffle or a persist write. The funnel's residual
  vs DuckDB is the 15-shuffle-stage floor, not the gram path.

The composite exists because pipelines ship compositions, not operator
menus: this is the integration test that the pieces actually fit —
tests/test_pipeline_ops.py pins its counts against running the §2C
operators one by one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["training_corpus_stages", "corpus_diff_report", "dataset_card"]


def _funnel_lazy(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    broadcast_eval: bool = True,
) -> tuple[DataFrame, list[DataFrame]]:
    """Build the funnel's five-count union WITHOUT executing it.
    Returns (lazy_counts, persisted_frames) — the public operator
    collects the counts and releases the persists; tests pin the plan
    of the lazy frame directly."""
    from .dedup import normalize_text_expr
    from .sampling import hash_split
    from .text import gopher_quality_filter
    winner_ids = (
        docs.withColumn("__h", F.md5(normalize_text_expr(F.col(text_col))))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
        .persist()
    )
    # Quality flags are per-document, so gopher runs on the RAW corpus
    # CONCURRENTLY with the winner aggregate (independent branches of
    # the one count job) — A/B-measured faster at sf0.1 than
    # restricting gopher to winners first, because that serializes the
    # critical path behind the dedup shuffle. On a corpus whose dup
    # fraction is large (common at 100 TB), flip the trade: seed gopher
    # with docs.join(winner_ids, left_semi) to cut its token-level
    # shuffles by the dup fraction — flags of surviving docs are
    # identical either way.
    keep_ids = (
        gopher_quality_filter(docs, id_col, text_col)
        .filter(F.col("keep"))
        .select(F.col("id").alias(id_col))
    )
    s2_ids = winner_ids.join(keep_ids, id_col, "left_semi")
    sp_ids = hash_split(
        s2_ids, id_col, {"train": 0.9, "test": 0.1}
    ).persist()
    train_ids = sp_ids.filter(F.col("split") == "train").select(id_col)
    test_ids = sp_ids.filter(F.col("split") == "test").select(id_col)

    def grams8(ids: DataFrame, bcast_ids: bool) -> DataFrame:
        # No pre-repartition here: the gram stream feeds a join that
        # redistributes it anyway (or a broadcast build), so an extra
        # exchange only adds a stage barrier (module docstring).
        arr = (
            docs.join(
                F.broadcast(ids) if bcast_ids else ids,
                id_col,
                "left_semi",
            )
            .select(
                F.col(id_col).alias("id"),
                F.split(F.col(text_col), " ").alias("__ws"),
            )
            .filter(F.size("__ws") >= 8)
        )
        n = F.size("__ws")
        return (
            arr.select(
                "id",
                F.explode(F.sequence(F.lit(1), n - 7)).alias("__i"),
                "__ws",
            )
            .select(
                "id",
                F.concat_ws(
                    " ", F.slice("__ws", F.col("__i"), 8)
                ).alias("shingle"),
            )
            .filter(F.length("shingle") > 0)
        )

    eval_grams = grams8(test_ids, broadcast_eval).select("shingle")
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    contaminated = (
        grams8(train_ids, False)
        .join(eval_grams, "shingle", "left_semi")
        .select("id")
        .distinct()
    )

    def cnt(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    lazy = (
        cnt("0_raw", docs)
        .unionAll(cnt("1_normalized_dedup", winner_ids))
        .unionAll(cnt("2_quality", s2_ids))
        .unionAll(cnt("3_train_split", train_ids))
        .unionAll(cnt("__contaminated", contaminated))
    )
    return lazy, [winner_ids, sp_ids]


def training_corpus_stages(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Run the funnel and return (stage, n_docs) — five rows, ordered.

    Thresholds are the operator defaults (documented there); the split
    is 90/10 train/test keyed on ``id_col``; decontamination drops
    TRAIN documents that share any 8-gram with the test split.  Stage
    semantics are identical to chaining dedup_exact_normalized →
    gopher_quality_filter → hash_split → ngram_decontaminate (the
    Gopher verdict is a per-document function, so computing it on the
    raw corpus instead of the deduped one cannot change any flag;
    tests/test_pipeline_ops.py pins the counts against that explicit
    chain).  ``broadcast_eval`` broadcasts the held-out split's ids and
    gram stream (the right default — eval sets are benchmark-sized);
    pass False when the eval corpus itself is shuffle-scale."""
    spark = docs.sparkSession
    lazy, persisted = _funnel_lazy(
        docs, id_col, text_col, broadcast_eval
    )
    counts = {r["stage"]: r["n_docs"] for r in lazy.collect()}
    for p in persisted:
        p.unpersist()
    counts["4_decontaminated"] = counts["3_train_split"] - counts.pop(
        "__contaminated"
    )
    return spark.createDataFrame(
        sorted(counts.items()), "stage string, n_docs long"
    ).orderBy("stage")


def corpus_diff_report(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Dataset-versioning audit between two corpus snapshots: every
    document id classified as ``added`` (new only), ``removed`` (old
    only), ``changed`` (both, different normalized-text hash) or
    ``unchanged`` — returned as (status, n_docs), four rows, ordered.
    The release-to-release readout a training-data pipeline publishes
    with each corpus version (what changed since the data the last
    model saw).

    Scale shape: each side reduces to a narrow (id, hash) projection
    inside its scan — md5 of the SAME normalization the exact-dedup
    family keys on — and the comparison is one full-outer equi-join on
    the id followed by a four-row aggregate. Nothing is ever wider
    than two hashes per id; at 100 TB this is two scans and one keyed
    shuffle."""
    from .dedup import normalize_text_expr

    def side(df: DataFrame, h: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.md5(normalize_text_expr(F.col(text_col))).alias(h),
        )

    joined = side(old, "__ho").join(side(new, "__hn"), "id", "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") == F.col("__hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("status")
    )


def dataset_card(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Dataset card — the one-table summary a corpus release publishes
    (datasheet/model-card practice): volume (docs/tokens/chars),
    provenance breadth (sources, languages), shape (avg + median
    tokens per doc) and hygiene (normalized exact-duplicate fraction,
    via the same normalization as ``dedup_exact_normalized``).
    Returns (metric, value) rows, ordered — every number is exactly
    reproducible by any engine, so release cards can be re-audited.

    Spark shape: one staged projection computes tokens/chars/norm-hash
    per document; four small aggregates (plain stats; distinct
    sources; distinct langs; distinct hashes — SEPARATE aggregates,
    never one multi-countDistinct whose EXPAND would multiply the
    corpus rows) cross-join their single rows and unstack with
    ``stack``. The median is the only sort-based term and Spark runs
    it as an approximate-free single-column aggregate."""
    from ..operators.dedup import normalize_text_expr

    staged = df.select(
        F.size(F.split(F.col(text_col), " ")).alias("toks"),
        F.length(text_col).alias("chars"),
        F.md5(normalize_text_expr(F.col(text_col))).alias("h"),
        F.col(source_col).alias("src"),
        F.col(lang_col).alias("lng"),
    )
    base = staged.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("toks").cast("double").alias("n_tokens"),
        F.sum("chars").cast("double").alias("n_chars"),
        (F.round(F.avg("toks"), 6) + F.lit(0.0)).alias("avg_tokens"),
        (F.round(F.median("toks"), 6) + F.lit(0.0)).alias("median_tokens"),
    )
    n_src = (
        staged.groupBy("src").agg(F.lit(1))
        .agg(F.count(F.lit(1)).cast("double").alias("n_sources"))
    )
    n_lng = (
        staged.groupBy("lng").agg(F.lit(1))
        .agg(F.count(F.lit(1)).cast("double").alias("n_langs"))
    )
    n_hash = (
        staged.groupBy("h").agg(F.lit(1))
        .agg(F.count(F.lit(1)).cast("double").alias("n_distinct"))
    )
    wide = (
        base.crossJoin(F.broadcast(n_src))
        .crossJoin(F.broadcast(n_lng))
        .crossJoin(F.broadcast(n_hash))
        .withColumn(
            "dup_frac",
            F.round(
                F.lit(1.0) - F.col("n_distinct") / F.col("n_docs"), 6
            )
            + F.lit(0.0),
        )
    )
    stack = ", ".join(
        f"'{m}', {c}"
        for m, c in [
            ("avg_tokens_per_doc", "avg_tokens"),
            ("exact_dup_frac_normalized", "dup_frac"),
            ("median_tokens_per_doc", "median_tokens"),
            ("n_chars", "n_chars"),
            ("n_docs", "n_docs"),
            ("n_langs", "n_langs"),
            ("n_sources", "n_sources"),
            ("n_tokens", "n_tokens"),
        ]
    )
    return wide.select(
        F.expr(f"stack(8, {stack}) AS (metric, value)")
    ).orderBy("metric")
