"""Round-4 additions: duplicated-span stats, unigram-LM scoring,
deterministic shard assignment."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from shaper_spark.operators.dupspans import duplicated_span_stats
from shaper_spark.operators.sampling import shard_assign
from shaper_spark.operators.text import unigram_lm_scores


class TestDuplicatedSpanStats:
    def rows(self, spark, texts, k=3):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["id", "text"]
        )
        return {
            r["id"]: r.asDict()
            for r in duplicated_span_stats(df, "id", "text", k=k).collect()
        }

    def test_no_cross_doc_overlap(self, spark):
        out = self.rows(spark, ["a b c d", "e f g h"])
        assert out[0]["n_grams"] == 2  # positions 0,1 for k=3
        assert out[0]["n_dup_grams"] == 0
        assert out[0]["dup_frac"] == 0.0
        assert out[1]["n_dup_grams"] == 0

    def test_shared_span_flagged_in_both_docs(self, spark):
        # trigram "x y z" occurs in both docs; each doc's other grams
        # are unique to it.
        out = self.rows(spark, ["x y z a a", "b b x y z"])
        assert out[0]["n_grams"] == 3
        assert out[0]["n_dup_grams"] == 1
        assert out[0]["dup_frac"] == pytest.approx(1 / 3, abs=1e-6)
        assert out[1]["n_dup_grams"] == 1

    def test_within_doc_repeat_is_not_cross_doc_dup(self, spark):
        # "p q r" twice in ONE doc only — df counts distinct docs, so
        # it is not a cross-document duplicate.
        out = self.rows(spark, ["p q r p q r", "u v w x y"])
        assert out[0]["n_dup_grams"] == 0

    def test_doc_shorter_than_k_drops_out(self, spark):
        out = self.rows(spark, ["a b", "a b c d"])
        assert 0 not in out
        assert out[1]["n_grams"] == 2

    def test_identical_docs_fully_duplicated(self, spark):
        out = self.rows(spark, ["m n o p", "m n o p"])
        for i in (0, 1):
            assert out[i]["n_grams"] == 2
            assert out[i]["n_dup_grams"] == 2
            assert out[i]["dup_frac"] == 1.0


class TestUnigramLmScores:
    def test_uniform_corpus_bits(self, spark):
        # 4 distinct tokens, each once → p=1/4 → 2 bits everywhere.
        df = spark.createDataFrame([(0, "a b"), (1, "c d")], ["id", "text"])
        out = {
            r["id"]: r.asDict()
            for r in unigram_lm_scores(df, "id", "text").collect()
        }
        assert out[0]["n_tokens"] == 2
        assert out[0]["bits_per_token"] == pytest.approx(2.0)
        assert out[1]["bits_per_token"] == pytest.approx(2.0)

    def test_common_token_scores_fewer_bits(self, spark):
        # "the the the" doc reuses the corpus-dominant token — its
        # bits/token must be lower than the rare-token doc's.
        df = spark.createDataFrame(
            [(0, "the the the"), (1, "zyx the")], ["id", "text"]
        )
        out = {
            r["id"]: r.asDict()
            for r in unigram_lm_scores(df, "id", "text").collect()
        }
        assert out[0]["bits_per_token"] < out[1]["bits_per_token"]
        # exact: p(the)=4/5, p(zyx)=1/5
        assert out[0]["bits_per_token"] == pytest.approx(
            -math.log2(4 / 5), abs=1e-6
        )
        assert out[1]["bits_per_token"] == pytest.approx(
            (-math.log2(1 / 5) - math.log2(4 / 5)) / 2, abs=1e-6
        )

    def test_matches_python_reference(self, spark):
        texts = ["a b c a", "b b d", "e a b", "f", "a a a b c"]
        df = spark.createDataFrame(list(enumerate(texts)), ["id", "text"])
        out = {
            r["id"]: r["bits_per_token"]
            for r in unigram_lm_scores(df, "id", "text").collect()
        }
        from collections import Counter

        toks = [t for s in texts for t in s.split()]
        tf = Counter(toks)
        total = len(toks)
        for i, s in enumerate(texts):
            ref = sum(-math.log2(tf[t] / total) for t in s.split()) / len(
                s.split()
            )
            assert out[i] == pytest.approx(ref, abs=1e-6)


class TestShardAssign:
    def test_deterministic_and_in_range(self, spark):
        df = spark.createDataFrame([(i,) for i in range(200)], ["id"])
        a = {r["id"]: r["shard"] for r in shard_assign(df, "id", 8).collect()}
        b = {r["id"]: r["shard"] for r in shard_assign(df, "id", 8).collect()}
        assert a == b
        assert set(a.values()) <= set(range(8))

    def test_balanced_within_sampling_noise(self, spark):
        df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
        counts = (
            shard_assign(df, "id", 4)
            .groupBy("shard")
            .count()
            .collect()
        )
        sizes = [r["count"] for r in counts]
        assert len(sizes) == 4
        # 2000 keys over 4 shards: expect 500 ± ~5σ (σ≈19)
        assert all(400 <= s <= 600 for s in sizes)

    def test_seed_changes_assignment(self, spark):
        df = spark.createDataFrame([(i,) for i in range(100)], ["id"])
        a = {r["id"]: r["shard"] for r in shard_assign(df, "id", 8).collect()}
        c = {
            r["id"]: r["shard"]
            for r in shard_assign(df, "id", 8, seed="other").collect()
        }
        assert a != c

    def test_no_shuffle_in_plan(self, spark):
        df = spark.createDataFrame([(i,) for i in range(10)], ["id"])
        plan = (
            shard_assign(df, "id", 8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_rejects_bad_shard_count(self, spark):
        df = spark.createDataFrame([(1,)], ["id"])
        with pytest.raises(ValueError):
            shard_assign(df, "id", 0)


class TestWriteTrainingShards:
    def test_layout_file_count_and_membership(self, spark, tmp_path):
        from shaper_spark.operators.sampling import write_training_shards

        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(500)], ["id", "text"]
        )
        path = str(tmp_path / "shards")
        write_training_shards(df, path, "id", 8)

        import glob
        import os

        dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
        assert [os.path.basename(d) for d in dirs] == [
            f"shard={i}" for i in range(8)
        ]
        # one repartition stream per shard → exactly one data file each
        for d in dirs:
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)

        back = spark.read.parquet(path)
        assert back.count() == 500
        expect = {
            r["id"]: r["shard"]
            for r in shard_assign(df, "id", 8).collect()
        }
        got = {r["id"]: r["shard"] for r in back.collect()}
        assert got == expect


class TestDedupExactNormalized:
    def test_case_punct_whitespace_variants_collapse(self, spark):
        from shaper_spark.operators.dedup import dedup_exact_normalized

        df = spark.createDataFrame(
            [
                (1, "Hello,   World!"),
                (2, "hello world"),
                (3, "HELLO  WORLD."),
                (4, "another doc"),
            ],
            ["id", "text"],
        )
        out = sorted(
            r["id"] for r in dedup_exact_normalized(df, "text", "id").collect()
        )
        assert out == [1, 4]  # lowest id per normalized group survives

    def test_normalization_expr(self, spark):
        from pyspark.sql import functions as F

        from shaper_spark.operators.dedup import normalize_text_expr

        df = spark.createDataFrame([("  MiXed!!  case?  x9 ",)], ["t"])
        got = df.select(normalize_text_expr(F.col("t")).alias("n")).collect()
        assert got[0]["n"] == "mixed case x9"


class TestRemoveDuplicatedSpans:
    def rows(self, spark, texts, k=3):
        from shaper_spark.operators.dupspans import remove_duplicated_spans

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["id", "text"]
        )
        return {
            r["id"]: r.asDict()
            for r in remove_duplicated_spans(df, "id", "text", k=k).collect()
        }

    def test_no_dups_pass_through(self, spark):
        out = self.rows(spark, ["a b c d", "e f g h"])
        assert out[0]["clean_text"] == "a b c d"
        assert out[0]["n_removed"] == 0
        assert out[1]["clean_text"] == "e f g h"

    def test_shared_span_removed_from_both(self, spark):
        out = self.rows(spark, ["p q r a b c", "x y z a b c"])
        # trigram "a b c" shared → positions 4-6 removed in both
        assert out[0]["clean_text"] == "p q r"
        assert out[0]["n_removed"] == 3
        assert out[1]["clean_text"] == "x y z"

    def test_fully_duplicated_doc_empties(self, spark):
        out = self.rows(spark, ["m n o", "m n o"])
        for i in (0, 1):
            assert out[i]["clean_text"] == ""
            assert out[i]["n_kept"] == 0
            assert out[i]["n_removed"] == 3

    def test_overlapping_spans_merge(self, spark):
        # both docs share "a b c" and "b c d": covered 1-4 in doc0
        out = self.rows(spark, ["a b c d e", "a b c d x"])
        assert out[0]["clean_text"] == "e"
        assert out[0]["n_removed"] == 4

    def test_short_doc_untouched(self, spark):
        out = self.rows(spark, ["a b", "a b c d"])
        assert out[0]["clean_text"] == "a b"
        assert out[0]["n_removed"] == 0


class TestBigramLmScores:
    def test_matches_python_reference(self, spark):
        import math
        from collections import Counter

        from shaper_spark.operators.text import bigram_lm_scores

        texts = ["a b a b c", "b a b", "c a b a", "a a b b"]
        lam = 0.7
        df = spark.createDataFrame(list(enumerate(texts)), ["id", "text"])
        got = {
            r["id"]: (r["n_tokens"], r["bits_per_token"])
            for r in bigram_lm_scores(df, "id", "text", lam=lam).collect()
        }
        toks = [t for s in texts for t in s.split()]
        uni = Counter(toks)
        total = len(toks)
        bi = Counter(
            (w[i], w[i + 1])
            for s in texts
            for w in [s.split()]
            for i in range(len(w) - 1)
        )
        for i, s in enumerate(texts):
            w = s.split()
            bits = [-math.log2(uni[w[0]] / total)]
            for a, b in zip(w, w[1:]):
                pb = bi[(a, b)] / uni[a]
                pu = uni[b] / total
                bits.append(-math.log2(lam * pb + (1 - lam) * pu))
            want = sum(bits) / len(bits)
            assert got[i][0] == len(w)
            assert got[i][1] == pytest.approx(want, abs=1e-6), (i, s)

    def test_boilerplate_scores_fewer_bits_than_noise(self, spark):
        from shaper_spark.operators.text import bigram_lm_scores

        texts = {
            0: "the cat sat " * 20,       # repeated, predictable bigrams
            1: " ".join(f"z{i}q" for i in range(60)),  # all-rare tokens
        }
        df = spark.createDataFrame(
            [(k, v.strip()) for k, v in texts.items()], ["id", "text"]
        )
        out = {
            r["id"]: r["bits_per_token"]
            for r in bigram_lm_scores(df, "id", "text").collect()
        }
        assert out[0] < out[1]

    def test_rejects_bad_lambda(self, spark):
        from shaper_spark.operators.text import bigram_lm_scores

        df = spark.createDataFrame([(1, "a b")], ["id", "text"])
        for bad in (0.0, 1.0, -1.0):
            with pytest.raises(ValueError):
                bigram_lm_scores(df, "id", "text", lam=bad)
