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

    # ONE corpus scan computes every per-document stage ingredient
    # (r9 verdict task #4: stack the stage predicates into a single
    # pass, stage membership as conditional aggs — the
    # filter_threshold_sweep grid trick applied to the funnel).  The
    # scan is repetition_stats' exchange-free bigram shape with the
    # dedup hash, the avg-word-length sum, and the split key RIDING
    # ALONG as first()s, so the old separate winner scan, gopher scan,
    # and the (winner ⋈ keep) id join all disappear: text is decoded
    # once for flags, and the only remaining exchanges are the one
    # doc-id exchange (satisfies both bigram groupBys), one NARROW
    # (id, hash, keep, split) window exchange for the winner rule, and
    # the gram-path joins.  Rule arithmetic replicates
    # gopher_quality_filter/repetition_stats expression-for-expression
    # (same 6-dp rounds), so every verdict is identical —
    # tests/test_pipeline_ops.py pins the counts against running the
    # explicit operator chain.
    # size-aware fan-out for the one pinned exchange (r11): AQE cannot
    # coalesce a user-specified partition count, and at benchmark scale
    # (sub-MB corpus) 32 reduce tasks per wave are pure dispatch floor —
    # on a real cluster the size estimate clears the core-count cap and
    # this is exactly the old defaultParallelism spread
    from ..session import scaled_parallelism

    par = scaled_parallelism(docs)
    words = F.split(F.col(text_col), " ")
    n0 = F.size(words)
    # the three cheap Gopher rules (word count, avg word length,
    # dup-word fraction) are pure per-row expressions — only
    # top_bigram_frac needs the bigram stream, so docs that already
    # fail a cheap rule emit just their sentinel row (no bigrams):
    # the corpus-scale explode shrinks by the cheap-fail fraction
    nd0 = F.size(F.array_distinct(words))
    swl0 = F.length(text_col) - (n0 - F.lit(1))
    awl0 = F.round(
        swl0.cast("double") / F.greatest(n0, F.lit(1)), 6
    )
    dwf0 = F.round(1 - nd0.cast("double") / n0, 6)
    cheap_violated = (
        (n0 < 50)
        | (n0 > 100_000)
        | (awl0 < 3.0)
        | (awl0 > 10.0)
        | (dwf0 > 0.9)
    )
    arr = docs.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("id"),
        # xxhash64, not md5: the funnel's output is five counts — the
        # dedup-group hash never crosses an engine boundary, so the
        # JVM-native 64-bit hash (8-byte exchange key) groups the same
        # normalized texts the oracle's md5 does
        F.xxhash64(normalize_text_expr(F.col(text_col))).alias("__h"),
        n0.alias("__n"),
        cheap_violated.alias("__cv"),
        words.alias("__ws"),
    )
    stream = arr.select(
        "id",
        "__h",
        "__n",
        "__cv",
        F.explode(
            F.sequence(
                F.lit(0),
                F.when(F.col("__cv"), F.lit(0)).otherwise(
                    F.greatest(F.col("__n") - 1, F.lit(0))
                ),
            )
        ).alias("__i"),
        "__ws",
    ).select(
        "id",
        "__h",
        "__n",
        "__cv",
        # bigram identity as xxhash64 of the word PAIR (not a
        # slice+concat string): the verdict only needs counts of equal
        # bigrams, so the 8-byte key skips two allocations per
        # position (same counts-only hashing rule as __h and the
        # novelty grams, r10/r11)
        F.when(
            F.col("__i") > 0,
            F.xxhash64(
                F.element_at("__ws", F.col("__i")),
                F.element_at("__ws", F.col("__i") + 1),
            ),
        ).alias("bigram"),
    )
    per_bigram = stream.groupBy("id", "bigram").agg(
        F.count(F.lit(1)).alias("__c"),
        F.first("__n").alias("__n"),
        F.first("__cv").alias("__cv"),
        F.first("__h").alias("__h"),
    )
    per_doc = per_bigram.groupBy("id").agg(
        F.first("__n").alias("n_words"),
        F.first("__cv").alias("__cv"),
        F.first("__h").alias("__h"),
        F.coalesce(
            F.sum(F.when(F.col("bigram").isNotNull(), F.col("__c"))),
            F.lit(0),
        ).alias("__nbg"),
        F.max(
            F.when(F.col("bigram").isNotNull(), F.col("__c"))
        ).alias("__top"),
    )
    # full Gopher §A1.1 verdict: cheap rules + the bigram rule, same
    # 6-dp rounds as gopher_quality_filter; a NULL bigram stat adds no
    # violation, exactly like the reasons-array original
    top_bigram_frac = F.round(
        F.col("__top").cast("double")
        / F.greatest(F.col("__nbg"), F.lit(1)),
        6,
    )
    violated = F.col("__cv") | F.coalesce(
        top_bigram_frac > 0.5, F.lit(False)
    )
    flags = hash_split(
        per_doc.select("id", "__h", (~violated).alias("__keep")),
        "id",
        {"train": 0.9, "test": 0.1},
    )
    # winner rule as a partial-aggregable struct-min per normalized
    # hash: min(struct(id, keep, split)) is lexicographic on the
    # unique id, so the struct carries the WINNER's flags out of the
    # group — skew-safe (map-side combine absorbs giant dup groups,
    # which a window over __h would sort in one partition) and one
    # stage cheaper than window + per-row flag
    # coalesce before the persist: cached plans bypass AQE, so without
    # it the cache holds shuffle.partitions-many slivers and every
    # downstream wave (counts agg, two broadcast builds) dispatches
    # that many tasks over a kilobyte-scale frame — coalesce is a
    # task-count cap, not a shuffle, and `par` already scales with
    # input size (r11)
    # r14: the winner struct is bit-packed into ONE bigint before the
    # min — min(struct) is declarative but its struct buffer falls off
    # HashAggregateExec's primitive-buffer fast path, so the planner
    # emitted SortAggregate with a map-side AND reduce-side sort of
    # the per-doc frame (measured in the r14 funnel plan).  enc =
    # id·4 + keep·2 + is_train is strictly monotone in the unique id
    # (ids are unique per hash group), so min(enc) picks the same
    # winner row; the flags decode back losslessly (two's-complement
    # shifts keep negative ids exact; |id| < 2^61 bounds the pack).
    enc = (
        F.col("id") * F.lit(4)
        + F.col("__keep").cast("long") * F.lit(2)
        + (F.col("split") == "train").cast("long")
    )
    groups = (
        flags.groupBy("__h")
        .agg(
            F.count(F.lit(1)).alias("__sz"),
            F.min(enc).alias("__e"),
        )
        .select(
            "__h",
            "__sz",
            F.struct(
                F.shiftright("__e", 2).alias("id"),
                (
                    F.shiftright("__e", 1).bitwiseAND(F.lit(1))
                    == F.lit(1)
                ).alias("__keep"),
                F.when(
                    F.col("__e").bitwiseAND(F.lit(1)) == F.lit(1),
                    F.lit("train"),
                )
                .otherwise(F.lit("test"))
                .alias("split"),
            ).alias("__w"),
        )
        .coalesce(par)
        .persist()
    )
    survivor = F.col("__w.__keep")
    train_ids = groups.filter(
        survivor & (F.col("__w.split") == "train")
    ).select(F.col("__w.id").alias(id_col))
    test_ids = groups.filter(
        survivor & (F.col("__w.split") == "test")
    ).select(F.col("__w.id").alias(id_col))

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

    # the first four stages are conditional sums over ONE pass of the
    # persisted per-hash-group frame (the threshold-sweep grid trick) —
    # only the contamination count needs its own (gram-join) aggregate
    b2l = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    wide = groups.agg(
        F.sum("__sz").alias("c0"),
        F.count(F.lit(1)).alias("c1"),
        b2l(survivor).alias("c2"),
        b2l(survivor & (F.col("__w.split") == "train")).alias("c3"),
    )
    stages4 = wide.select(
        F.expr(
            "stack(4, '0_raw', c0, '1_normalized_dedup', c1,"
            " '2_quality', c2, '3_train_split', c3)"
            " AS (stage, n_docs)"
        )
    )
    lazy = stages4.unionAll(
        contaminated.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit("__contaminated").alias("stage"), "n_docs"
        )
    )
    return lazy, [groups]


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
    # rows are pre-sorted (python sorted == ORDER BY stage, ASCII) and
    # createDataFrame preserves local-relation order — an orderBy here
    # would add one more tiny job per call for nothing (r11).
    # pandas, not tuples (r14): the tuple path goes through RDD
    # conversion (~0.5 s of driver overhead for 5 rows — the
    # _merge_topk measurement); the pandas path goes through Arrow.
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            sorted(counts.items()), columns=["stage", "n_docs"]
        ),
        schema="stage string, n_docs long",
    )


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
