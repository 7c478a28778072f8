"""Greedy sequence packing into token budgets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shaper_spark.operators.packing import pack_sequences


class TestPackSequences:
    def test_greedy_semantics(self, spark):
        df = spark.createDataFrame(
            [("g", i, t) for i, t in enumerate([40, 50, 30, 100, 120, 10, 10])],
            "grp string, doc long, tokens long",
        )
        out = pack_sequences(df, ["grp"], "doc", "tokens", budget=100)
        got = {r["doc"]: r["chunk"] for r in out.collect()}
        # 40+50=90 fits; 30 overflows -> chunk 1; 100 exactly fills... 30+100>100
        assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4}

    def test_oversized_doc_gets_own_chunk(self, spark):
        df = spark.createDataFrame(
            [("g", 0, 500), ("g", 1, 10)], "grp string, doc long, tokens long"
        )
        out = pack_sequences(df, ["grp"], "doc", "tokens", budget=100)
        got = {r["doc"]: r["chunk"] for r in out.collect()}
        assert got == {0: 0, 1: 1}

    def test_groups_pack_independently(self, spark, sf_dir):
        from shaper_spark.session import register_sf_tables

        register_sf_tables(spark, sf_dir)
        docs = spark.table("documents").select(
            "lang", "doc_id", F.size(F.split("text", " ")).alias("tokens")
        )
        out = pack_sequences(docs, ["lang"], "doc_id", "tokens", budget=2000)
        # every chunk except possibly each group's last is near-full:
        # no chunk total exceeds budget unless it is a single outsized doc
        sums = (
            out.groupBy("lang", "chunk")
            .agg(F.sum("tokens").alias("s"), F.count("*").alias("k"))
            .collect()
        )
        for r in sums:
            assert r["s"] <= 2000 or r["k"] == 1
        # chunks are dense 0..max within each group
        per = (
            out.groupBy("lang")
            .agg(F.countDistinct("chunk").alias("d"), (F.max("chunk") + 1).alias("m"))
            .collect()
        )
        for r in per:
            assert r["d"] == r["m"]

    def test_bad_args(self, spark):
        df = spark.createDataFrame([("g", 0, 1)], "grp string, doc long, tokens long")
        with pytest.raises(ValueError):
            pack_sequences(df, ["grp"], "doc", "tokens", budget=0)
        with pytest.raises(ValueError):
            pack_sequences(df, [], "doc", "tokens", budget=10)
