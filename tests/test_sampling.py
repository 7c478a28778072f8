"""Deterministic split / stratified sampling for training pipelines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shaper_spark.operators.sampling import hash_split, stratified_exact_sample


@pytest.fixture()
def docs(spark, sf_dir):
    from shaper_spark.session import register_sf_tables

    register_sf_tables(spark, sf_dir)
    return spark.table("documents")


class TestHashSplit:
    FR = {"train": 0.8, "val": 0.1, "test": 0.1}

    def test_deterministic_and_exhaustive(self, docs):
        a = hash_split(docs, "doc_id", self.FR)
        b = hash_split(docs, "doc_id", self.FR)
        assert a.filter("split IS NULL").count() == 0
        ga = {r["doc_id"]: r["split"] for r in a.select("doc_id", "split").collect()}
        gb = {r["doc_id"]: r["split"] for r in b.select("doc_id", "split").collect()}
        assert ga == gb

    def test_fractions_approximately_honored(self, docs):
        out = hash_split(docs, "doc_id", self.FR)
        n = docs.count()
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert abs(counts["train"] / n - 0.8) < 0.05
        assert abs(counts.get("val", 0) / n - 0.1) < 0.05

    def test_group_keyed_split_prevents_leakage(self, docs):
        # keyed on source: every row of a source lands in one split
        out = hash_split(docs, "source", self.FR)
        per_group = (
            out.groupBy("source")
            .agg(F.countDistinct("split").alias("k"))
            .agg(F.max("k"))
            .first()[0]
        )
        assert per_group == 1

    def test_bad_fractions_rejected(self, docs):
        with pytest.raises(ValueError):
            hash_split(docs, "doc_id", {"train": 0.5, "val": 0.1})


class TestStratifiedExactSample:
    def test_exact_counts_and_determinism(self, docs):
        out = stratified_exact_sample(docs, ["lang"], 7, "doc_id")
        counts = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        avail = {
            r["lang"]: r["n"]
            for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        for lang, n in counts.items():
            assert n == min(7, avail[lang])
        again = stratified_exact_sample(docs, ["lang"], 7, "doc_id")
        assert {r["doc_id"] for r in out.collect()} == {
            r["doc_id"] for r in again.collect()
        }

    def test_seed_changes_selection(self, docs):
        a = {r["doc_id"] for r in stratified_exact_sample(docs, ["lang"], 5, "doc_id", seed="s1").collect()}
        b = {r["doc_id"] for r in stratified_exact_sample(docs, ["lang"], 5, "doc_id", seed="s2").collect()}
        assert a != b
