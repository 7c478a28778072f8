"""End-to-end training-corpus build: the §2C operators composed into the
standard pretraining funnel, with a stage-count report that replays in
ANSI SQL (every stage is built from oracle-replayable primitives).

Funnel (the C4/RefinedWeb shape):

  0_raw                 input documents
  1_normalized_dedup    exact dedup after lowercase/punct/space
                        normalization (dedup_exact_normalized)
  2_quality             Gopher §A1.1 composite filter keeps
                        (gopher_quality_filter)
  3_train_split         leakage-safe hash split, train side
                        (hash_split, 90/10)
  4_decontaminated      train docs sharing an 8-gram with the held-out
                        test split dropped (ngram_decontaminate run in
                        the train-cleaning direction)

Scale shape: each stage is the documented shuffle plan of its operator;
the funnel never collects anything to the driver — the five stage
counts are one lazy union of single-row aggregates, so Spark runs the
whole build as one job graph and shares the scan. The composite exists
because pipelines ship compositions, not operator menus: this is the
integration test that the pieces actually fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["training_corpus_stages"]


def training_corpus_stages(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Run the funnel and return (stage, n_docs) — five rows, ordered.

    Thresholds are the operator defaults (documented there); the split
    is 90/10 train/test keyed on ``id_col``; decontamination drops
    TRAIN documents that share any 8-gram with the test split (the
    train-cleaning direction of ngram_decontaminate)."""
    from .decontam import ngram_decontaminate
    from .dedup import dedup_exact_normalized
    from .sampling import hash_split
    from .text import gopher_quality_filter

    from pyspark import StorageLevel

    # The five stage counts are separate branches of one lineage; without
    # a persist each branch would recompute its whole prefix (the dedup
    # min-by, the Gopher aggregates, the shingle join) — measured ~4× the
    # funnel's real work. Persist the two frames every later stage reads.
    s1 = dedup_exact_normalized(docs, text_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    keep_ids = (
        gopher_quality_filter(s1, id_col, text_col)
        .filter(F.col("keep"))
        .select(F.col("id").alias(id_col))
    )
    s2 = s1.join(keep_ids, id_col, "left_semi")
    sp = hash_split(s2, id_col, {"train": 0.9, "test": 0.1}).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    train = sp.filter(F.col("split") == "train")
    test = sp.filter(F.col("split") == "test")
    contaminated = ngram_decontaminate(
        test, train, id_col, text_col, n=8
    ).select(F.col("eval_id").alias(id_col))
    s4 = train.join(contaminated, id_col, "left_anti")

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    return (
        stage("0_raw", docs)
        .unionAll(stage("1_normalized_dedup", s1))
        .unionAll(stage("2_quality", s2))
        .unionAll(stage("3_train_split", train))
        .unionAll(stage("4_decontaminated", s4))
        .orderBy("stage")
    )
