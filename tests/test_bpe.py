"""BPE vocabulary learning: Sennrich-style merges from the corpus word
frequencies, validated against a hand-worked example and invariants."""

from __future__ import annotations

import pytest

from shaper_spark.operators.bpe import bpe_encode, learn_bpe


class TestLearnBpe:
    def test_sennrich_style_example(self, spark):
        # classic corpus: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
        text = " ".join(
            ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        )
        df = spark.createDataFrame([(text,)], ["text"])
        merges = learn_bpe(df, "text", n_merges=4)
        # 'es' appears 9 times (newest+widest) — the first merge;
        # then 'es'+'t' (9), then 'est'+'</w>' (9), then 'l'+'o' (7)
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        assert merges[2] == ("est", "</w>")
        assert merges[3] == ("l", "o")

    def test_encode_applies_merges(self, spark):
        text = " ".join(["abab"] * 10)
        df = spark.createDataFrame([(text,)], ["text"])
        merges = learn_bpe(df, "text", n_merges=3)
        toks = bpe_encode("abab", merges)
        # merges collapse the word into few symbols; round-trip holds
        assert "".join(toks).replace("</w>", "") == "abab"
        assert len(toks) < 5  # fewer symbols than characters

    def test_deterministic(self, spark):
        text = "aa ab ba bb aa ab"
        df = spark.createDataFrame([(text,)], ["text"])
        assert learn_bpe(df, "text", 5) == learn_bpe(df, "text", 5)

    def test_merges_exhaust_gracefully(self, spark):
        df = spark.createDataFrame([("a",)], ["text"])
        merges = learn_bpe(df, "text", n_merges=10)
        # single char + eow: exactly one possible merge
        assert merges == [("a", "</w>")]

    def test_max_words_caps_driver_vocab(self, spark):
        df = spark.createDataFrame(
            [(" ".join(f"w{i}" for i in range(100)),)], ["text"]
        )
        merges = learn_bpe(df, "text", n_merges=2, max_words=5)
        assert len(merges) == 2  # learned from the capped table only

    def test_rejects_bad_merge_count(self, spark):
        df = spark.createDataFrame([("a b",)], ["text"])
        with pytest.raises(ValueError):
            learn_bpe(df, "text", 0)


class TestEncodeCorpus:
    def test_counts_match_driver_encoder(self, spark):
        from shaper_spark.operators.bpe import (
            bpe_encode,
            bpe_encode_corpus,
            learn_bpe,
        )

        docs = spark.table("documents").limit(40)
        merges = learn_bpe(docs, "text", n_merges=15)
        got = {
            r["doc_id"]: (r["n_words"], r["n_tokens"])
            for r in bpe_encode_corpus(docs, "doc_id", "text", merges).collect()
        }
        for row in docs.select("doc_id", "text").collect():
            words = [w for w in row["text"].split(" ") if w]
            expect = (
                len(words),
                sum(len(bpe_encode(w, merges)) for w in words),
            )
            assert got[row["doc_id"]] == expect

    def test_empty_merges_yield_char_counts(self, spark):
        from shaper_spark.operators.bpe import bpe_encode_corpus

        df = spark.createDataFrame([(1, "ab c")], ["doc_id", "text"])
        row = bpe_encode_corpus(df, "doc_id", "text", []).collect()[0]
        # 'ab' -> a,b,</w> (3); 'c' -> c,</w> (2)
        assert (row["n_words"], row["n_tokens"]) == (2, 5)
        assert row["tokens_per_word"] == 2.5

    def test_no_shuffle_in_plan(self, spark):
        from shaper_spark.operators.bpe import bpe_encode_corpus

        df = bpe_encode_corpus(
            spark.table("documents"), "doc_id", "text", [("a", "b")]
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # tokenization is a map: the only exchange allowed is the
        # spread_for_compute round-robin of a single-split input
        assert "hashpartitioning" not in plan.lower()
        assert "SortMergeJoin" not in plan
