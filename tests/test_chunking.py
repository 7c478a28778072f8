"""Sliding-window chunking: coverage, overlap, and edge semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shaper_spark.operators.chunking import chunk_documents


class TestChunkDocuments:
    def test_exact_windows(self, spark):
        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(10)))], "id long, text string"
        )
        out = {r["chunk_id"]: r for r in chunk_documents(df, "id", "text", size=4, stride=3).collect()}
        # windows start at 0,3,6,9 → 1+ceil((10-4)/3)=3 → starts 0,3,6
        assert sorted(out) == [0, 1, 2]
        assert out[0]["chunk_text"] == "t0 t1 t2 t3"
        assert out[1]["chunk_text"] == "t3 t4 t5 t6"
        assert out[2]["chunk_text"] == "t6 t7 t8 t9"
        assert out[2]["n_tokens"] == 4

    def test_short_tail_window(self, spark):
        df = spark.createDataFrame([(1, "a b c d e")], "id long, text string")
        out = {r["chunk_id"]: r for r in chunk_documents(df, "id", "text", size=4, stride=4).collect()}
        assert sorted(out) == [0, 1]
        assert out[1]["chunk_text"] == "e"
        assert out[1]["n_tokens"] == 1

    def test_doc_shorter_than_window(self, spark):
        df = spark.createDataFrame([(1, "a b")], "id long, text string")
        rows = chunk_documents(df, "id", "text", size=10, stride=5).collect()
        assert len(rows) == 1
        assert rows[0]["chunk_text"] == "a b"

    def test_every_token_covered(self, spark, sf_dir):
        from shaper_spark.session import register_sf_tables

        register_sf_tables(spark, sf_dir)
        docs = spark.table("documents")
        out = chunk_documents(docs, "doc_id", "text", size=64, stride=48)
        # token conservation with overlap: sum over chunks >= token count,
        # and the non-overlap variant reproduces counts exactly
        exact = chunk_documents(docs, "doc_id", "text", size=64, stride=64)
        tok = docs.select(F.size(F.split("text", " ")).alias("n")).agg(F.sum("n")).first()[0]
        assert exact.agg(F.sum("n_tokens")).first()[0] == tok
        assert out.agg(F.sum("n_tokens")).first()[0] >= tok

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, "a")], "id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, "id", "text", size=0)
        with pytest.raises(ValueError):
            chunk_documents(df, "id", "text", size=4, stride=5)
