"""Int8 embedding quantization + exact uniform sampling."""

import math

import pytest
from pyspark.sql import functions as F


class TestQuantizeInt8:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, v array<double>")

    def test_roundtrip_error_bounded_by_half_step(self, spark):
        from shaper_spark.operators.quantize import quantize_int8

        rows = [(1, [0.5, -1.0, 0.25, 127.0]), (2, [3.0, 0.0, -2.0, 1.5])]
        out = {
            r["id"]: (r["scale"], r["q"])
            for r in quantize_int8(self._df(spark, rows), "id", "v").collect()
        }
        for vid, vec in rows:
            scale, q = out[vid]
            assert max(abs(x) for x in vec) == pytest.approx(scale * 127)
            for x, qi in zip(vec, q):
                assert abs(qi) <= 127
                assert abs(qi * scale - x) <= scale / 2 + 1e-12

    def test_zero_vector(self, spark):
        from shaper_spark.operators.quantize import quantize_int8

        out = quantize_int8(
            self._df(spark, [(1, [0.0, 0.0, 0.0])]), "id", "v"
        ).collect()[0]
        assert out["scale"] == 0.0
        assert list(out["q"]) == [0, 0, 0]

    def test_max_component_saturates_exactly(self, spark):
        from shaper_spark.operators.quantize import quantize_int8

        out = quantize_int8(
            self._df(spark, [(1, [-10.0, 5.0, 2.5])]), "id", "v"
        ).collect()[0]
        assert out["q"][0] == -127  # the max-|x| component hits ±127

    def test_report_integer_columns_match_bruteforce(self, spark):
        from shaper_spark.operators.quantize import quantization_report

        rows = [
            (1, "a", [1.0, -2.0, 0.5]),
            (2, "a", [0.0, 0.0, 0.0]),
            (3, "b", [4.0, 4.0, -4.0]),
        ]
        df = spark.createDataFrame(rows, "id long, g string, v array<double>")
        rep = {
            r["g"]: r
            for r in quantization_report(df, "v", "g").collect()
        }

        def brute(vec):
            s = max(abs(x) for x in vec) / 127.0
            if s == 0:
                return [0] * len(vec), 0.0
            return [math.floor(x / s + 0.5) for x in vec], s

        q1, _ = brute(rows[0][2])
        q2, _ = brute(rows[1][2])
        a = rep["a"]
        assert a["n_vecs"] == 2
        assert a["sum_q_l1"] == sum(abs(x) for x in q1 + q2)
        assert a["sum_q_sq"] == sum(x * x for x in q1 + q2)
        assert a["n_saturated"] == sum(1 for x in q1 + q2 if abs(x) == 127)
        b = rep["b"]
        assert b["n_vecs"] == 1 and b["n_saturated"] == 3  # all |q|=127

    def test_report_runs_on_float32_storage(self, spark):
        # the embeddings table stores array<float>; promotion to float64
        # must be exact
        from shaper_spark.operators.quantize import quantization_report

        df = spark.sql(
            "SELECT 1L AS id, 'g' AS g, "
            "CAST(array(1.5, -0.25) AS array<float>) AS v"
        )
        row = quantization_report(df, "v", "g").collect()[0]
        assert row["sum_q_l1"] == 127 + 21  # floor(-0.25/s+0.5), s=1.5/127


class TestUniformSampleExact:
    def test_exact_k_and_deterministic(self, spark):
        from shaper_spark.operators.sampling import uniform_sample_exact

        docs = spark.table("documents")
        a = sorted(
            r["doc_id"]
            for r in uniform_sample_exact(docs, "doc_id", 37).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in uniform_sample_exact(docs, "doc_id", 37).collect()
        )
        assert len(a) == 37 and a == b
        # different seed → different (overwhelmingly) sample
        c = sorted(
            r["doc_id"]
            for r in uniform_sample_exact(
                docs, "doc_id", 37, seed="other"
            ).collect()
        )
        assert a != c

    def test_k_larger_than_n(self, spark):
        from shaper_spark.operators.sampling import uniform_sample_exact

        df = spark.range(5).withColumnRenamed("id", "k")
        assert uniform_sample_exact(df, "k", 100).count() == 5

    def test_partitioning_invariance(self, spark):
        from shaper_spark.operators.sampling import uniform_sample_exact

        df = spark.range(1000).withColumnRenamed("id", "k")
        a = sorted(
            r["k"] for r in uniform_sample_exact(df, "k", 50).collect()
        )
        b = sorted(
            r["k"]
            for r in uniform_sample_exact(
                df.repartition(17), "k", 50
            ).collect()
        )
        assert a == b

    def test_plan_is_take_ordered_not_global_sort(self, spark):
        from shaper_spark.operators.sampling import uniform_sample_exact

        df = uniform_sample_exact(spark.table("documents"), "doc_id", 10)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
