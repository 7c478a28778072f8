"""Scale-path operators: salted aggregation/join equivalence and IVF ANN
recall against the exact baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shaper_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + long tail
    return spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


class TestSaltedAgg:
    def test_matches_plain_groupby(self, spark, skewed):
        plain = {
            r["k"]: r
            for r in skewed.groupBy("k")
            .agg(
                F.sum("v").alias("s"),
                F.count(F.lit(1)).alias("c"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
                F.avg("v").alias("a"),
            )
            .collect()
        }
        salted = {
            r["k"]: r
            for r in salted_agg(
                skewed,
                ["k"],
                {
                    "s": ("sum", "v"),
                    "c": ("count", "v"),
                    "mn": ("min", "v"),
                    "mx": ("max", "v"),
                    "a": ("avg", "v"),
                },
                salt=16,
            ).collect()
        }
        assert set(plain) == set(salted)
        for k in plain:
            assert plain[k]["s"] == salted[k]["s"]
            assert plain[k]["c"] == salted[k]["c"]
            assert plain[k]["mn"] == salted[k]["mn"]
            assert plain[k]["mx"] == salted[k]["mx"]
            assert abs(plain[k]["a"] - salted[k]["a"]) < 1e-9

    def test_unsupported_fn_raises(self, skewed):
        with pytest.raises(ValueError):
            salted_agg(skewed, ["k"], {"x": ("median", "v")})


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, skewed):
        dim = spark.createDataFrame(
            [("hot", "H"), ("k1", "A"), ("k2", "B")], "k string, label string"
        )
        plain = sorted(
            (r["k"], r["label"], r["v"])
            for r in skewed.join(dim, "k").collect()
        )
        salted = sorted(
            (r["k"], r["label"], r["v"])
            for r in salted_join(skewed, dim, "k", salt=8).collect()
        )
        assert plain == salted

    def test_left_join_preserves_unmatched(self, spark, skewed):
        dim = spark.createDataFrame([("hot", "H")], "k string, label string")
        plain = skewed.join(dim, "k", "left").count()
        salted = salted_join(skewed, dim, "k", salt=8, how="left").count()
        assert plain == salted == skewed.count()


class TestIvfTopk:
    def test_recall_against_exact(self, spark):
        from shaper_spark.session import register_sf_tables
        from shaper_spark.operators.similarity import cosine_topk, ivf_topk

        register_sf_tables(spark, "/root/testdata/sf0.001")
        emb = spark.table("embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        queries = emb.filter("vec_id < 10")
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, queries, k=3).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(emb, queries, k=3, n_cells=4, n_probe=2).collect()
        }
        # approximate: require decent overlap with exact neighbors
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.5, f"IVF recall too low: {recall}"
        # every query got k results
        assert len(approx) == len(exact)


class TestEmbeddingNearDups:
    """LSH is the default candidate path; brute force is opt-in only."""

    def _corpus(self, spark):
        from shaper_spark.session import register_sf_tables

        register_sf_tables(spark, "/root/testdata/sf0.001")
        emb = spark.table("embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        planted = emb.select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform("embedding", lambda x: x + F.lit(0.02)).alias("embedding"),
        )
        return emb.unionByName(planted)

    def test_lsh_equals_exact_on_fixture(self, spark):
        from shaper_spark.operators.dedup import embedding_near_dups

        corpus = self._corpus(spark)
        lsh = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in embedding_near_dups(
                corpus, "vec_id", "embedding", threshold=0.95
            ).collect()
        }
        exact = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in embedding_near_dups(
                corpus, "vec_id", "embedding", threshold=0.95, exact=True
            ).collect()
        }
        assert lsh == exact
        assert len(exact) >= 500  # one planted near-dup per base vector

    def test_default_plan_has_no_cross_join(self, spark):
        from shaper_spark.operators.dedup import embedding_near_dups

        plan = (
            embedding_near_dups(self._corpus(spark), "vec_id", "embedding")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_exact_escape_hatch_is_cross_join(self, spark):
        from shaper_spark.operators.dedup import embedding_near_dups

        plan = (
            embedding_near_dups(self._corpus(spark), "vec_id", "embedding", exact=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


class TestWinnowing:
    """Winnowing fingerprints (MOSS): positional guarantee + plan shape."""

    def test_shared_run_shares_a_fingerprint(self, spark):
        from shaper_spark.operators.text import winnow_fingerprints

        shared = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [
                (1, "one two " + shared + " three four five six seven"),
                (2, "nine ten eleven " + shared + " twelve thirteen"),
            ],
            "doc_id long, text string",
        )
        fp = winnow_fingerprints(docs, "doc_id", "text", k=5, window=4)
        by_doc = {}
        for r in fp.collect():
            by_doc.setdefault(r["id"], set()).add(r["fp_hash"])
        # shared 8-token run ≥ window+k-1 = 8 → guaranteed common print
        assert by_doc[1] & by_doc[2]

    def test_density_below_one(self, spark):
        from shaper_spark.session import register_sf_tables
        from shaper_spark.operators.text import winnow_fingerprints

        register_sf_tables(spark, "/root/testdata/sf0.001")
        docs = spark.table("documents")
        n_prints = winnow_fingerprints(docs, "doc_id", "text").count()
        n_grams = (
            docs.selectExpr("size(split(text, ' ')) - 4 AS g")
            .selectExpr("sum(greatest(g, 0)) AS s")
            .collect()[0]["s"]
        )
        # expected density ~ 2/(window+1) = 0.4; assert well under 1
        assert 0 < n_prints < 0.6 * n_grams

    def test_no_python_in_plan(self, spark):
        from shaper_spark.session import register_sf_tables
        from shaper_spark.operators.text import winnow_fingerprints

        register_sf_tables(spark, "/root/testdata/sf0.001")
        plan = (
            winnow_fingerprints(spark.table("documents"), "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestCentroidSimilarity:
    def test_identical_groups_cosine_one_orthogonal_zero(self, spark):
        from shaper_spark.operators.similarity import centroid_similarity

        rows = [
            (1, [1.0, 0.0], "a"),
            (2, [1.0, 0.0], "a"),   # centroid a = (1, 0)
            (3, [0.0, 2.0], "b"),   # centroid b = (0, 2)
            (4, [1.0, 0.0], "c"),   # centroid c = (1, 0) == a
        ]
        df = spark.createDataFrame(
            rows, "id long, embedding array<double>, g string"
        )
        out = {
            (r["group_a"], r["group_b"]): r["cosine"]
            for r in centroid_similarity(df, "g", "embedding").collect()
        }
        assert out[("a", "a")] == 1.0
        assert out[("a", "b")] == 0.0
        assert out[("a", "c")] == 1.0
        assert out[("b", "c")] == 0.0
        # upper triangle only
        assert ("b", "a") not in out

    def test_mean_pooling(self, spark):
        import math

        from shaper_spark.operators.similarity import centroid_similarity

        rows = [
            (1, [2.0, 0.0], "a"),
            (2, [0.0, 2.0], "a"),   # centroid a = (1, 1)
            (3, [1.0, 0.0], "b"),
        ]
        df = spark.createDataFrame(
            rows, "id long, embedding array<double>, g string"
        )
        out = {
            (r["group_a"], r["group_b"]): r["cosine"]
            for r in centroid_similarity(df, "g", "embedding").collect()
        }
        assert out[("a", "b")] == pytest.approx(1 / math.sqrt(2), abs=1e-6)


class TestKeySkewReport:
    def test_planted_hot_key_flagged(self, spark):
        from shaper_spark.operators.skew import key_skew_report

        rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
        df = spark.createDataFrame(rows, "k string")
        out = key_skew_report(df, "k", top_n=3).collect()
        assert out[0].key == "hot" and out[0].n_rows == 90
        assert abs(out[0].share - 0.9) < 1e-6
        # 11 distinct keys, uniform would be 100/11 rows each
        assert abs(out[0].vs_uniform - 90 * 11 / 100) < 1e-6

    def test_null_key_reported(self, spark):
        from shaper_spark.operators.skew import key_skew_report

        df = spark.createDataFrame(
            [(None,), (None,), ("a",)], "k string"
        )
        out = key_skew_report(df, "k", top_n=2).collect()
        assert out[0].key is None and out[0].n_rows == 2

    def test_take_ordered_no_global_sort(self, spark, sf_dir):
        from shaper_spark.operators.skew import key_skew_report
        from shaper_spark.session import register_sf_tables

        register_sf_tables(spark, sf_dir)
        df = key_skew_report(spark.table("events"), "user_id", top_n=15)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("Initial Plan")[0]
        assert "TakeOrderedAndProject" in final

    def test_validation(self, spark):
        import pytest as _pytest

        from shaper_spark.operators.skew import key_skew_report

        df = spark.createDataFrame([("a",)], "k string")
        with _pytest.raises(ValueError):
            key_skew_report(df, "k", top_n=0)


class TestIvfPersistedIndex:
    def _clean(self, spark, prefix):
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for t in (f"{prefix}_centroids", f"{prefix}_cells"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)

    def test_full_probe_is_exact(self, spark, sf_dir):
        from shaper_spark.operators.similarity import (
            build_ivf_index,
            cosine_topk,
            ivf_index_probe,
        )
        from shaper_spark.session import register_sf_tables

        register_sf_tables(spark, sf_dir)
        emb = spark.table("embeddings")
        self._clean(spark, "t_ivfp")
        rep = build_ivf_index(emb, "t_ivfp", n_cells=8)
        assert rep["n_cells"] == 8 and rep["n_vectors"] == emb.count()
        q = emb.filter("vec_id < 10")
        got = sorted(
            tuple(r)
            for r in ivf_index_probe(
                emb, q, "t_ivfp", k=3, n_probe=8
            ).collect()
        )
        exact = sorted(
            tuple(r) for r in cosine_topk(emb, q, k=3).collect()
        )
        assert got == exact
        self._clean(spark, "t_ivfp")

    def test_probe_prunes_partitions_at_planning(self, spark, sf_dir):
        import re

        from shaper_spark.operators.similarity import (
            build_ivf_index,
            ivf_index_probe,
        )
        from shaper_spark.session import register_sf_tables

        register_sf_tables(spark, sf_dir)
        emb = spark.table("embeddings")
        self._clean(spark, "t_ivfq")
        build_ivf_index(emb, "t_ivfq", n_cells=8)
        df = ivf_index_probe(emb, emb.limit(3), "t_ivfq", k=2, n_probe=2)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        scan = next(
            l for l in plan.splitlines()
            if "t_ivfq_cells" in l and "FileScan" in l
        )
        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", scan)
        assert pf and " IN (" in pf.group(1)  # literal IN-list pruning
        m = re.search(r"InMemoryFileIndex\((\d+) paths\)", scan)
        assert m and int(m.group(1)) < 8  # fewer than all cells read
        self._clean(spark, "t_ivfq")

    def test_rebuild_survives_stale_location(self, spark, sf_dir):
        import shutil
        from urllib.parse import urlparse

        from shaper_spark.operators.similarity import build_ivf_index
        from shaper_spark.session import register_sf_tables

        register_sf_tables(spark, sf_dir)
        emb = spark.table("embeddings")
        self._clean(spark, "t_ivfr")
        build_ivf_index(emb, "t_ivfr", n_cells=4)
        # simulate a fresh process: catalog entry gone, directory stays
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        spark.sql("DROP TABLE t_ivfr_centroids")
        assert not spark.catalog.tableExists("t_ivfr_centroids")
        # DROP removed the dir too in managed tables; recreate a stale one
        import os

        os.makedirs(f"{warehouse}/t_ivfr_centroids", exist_ok=True)
        rep = build_ivf_index(emb, "t_ivfr", n_cells=4)
        assert rep["n_cells"] == 4
        self._clean(spark, "t_ivfr")
