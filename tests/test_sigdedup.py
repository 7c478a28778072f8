"""Signature-store incremental dedup: the steady-state ingest regime
(operators/dedup.py signature_records + incremental_sig_dedup, and the
streaming maintenance wrapper in streaming.py). The contract under
test: classification matches incremental_dedup on the exact rules, the
near rule fires through the signature ESTIMATE, and the stream
maintains corpus + signature store consistently without corpus-text
scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the old river bank"),
    (2, "pack my box with five dozen liquor jugs before the long trip south"),
    (3, "sphinx of black quartz judge my vow said the tired museum curator"),
]
BATCH = [
    # exact_corpus: doc 1 with case/punct noise (normalizes identical)
    (10, "The QUICK brown fox, jumps over the lazy dog near the old river bank!"),
    # kept: novel text
    (11, "a completely different document about distributed query engines at scale"),
    # exact_batch: same normalized text as 11, larger id
    (12, "A completely different document about distributed query engines at scale."),
    # near_corpus: doc 2 with only the last word changed
    (13, "pack my box with five dozen liquor jugs before the long trip north"),
    # kept: short doc (no shingles -> no near surface)
    (14, "tiny doc"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestSignatureRecords:
    def test_schema_and_short_doc_null_sig(self, spark):
        from shaper_spark.operators.dedup import signature_records

        recs = signature_records(_df(spark, BATCH), "doc_id", "text")
        assert [f.name for f in recs.schema.fields] == ["id", "h", "sig"]
        by_id = {r["id"]: r for r in recs.collect()}
        assert len(by_id) == len(BATCH)
        # k=3 shingles need >= 3 words; "tiny doc" has none -> NULL sig
        assert by_id[14]["sig"] is None
        assert by_id[11]["sig"] is not None
        assert len(by_id[11]["sig"]) == 16
        # normalized-identical docs agree on h (sig is computed over
        # RAW-text shingles and may differ on punctuation — the exact
        # rule owns the normalized regime)
        assert by_id[12]["h"] == by_id[11]["h"]


class TestIncrementalSigDedup:
    def _verdicts(self, spark, **kw):
        from shaper_spark.operators.dedup import (
            incremental_sig_dedup,
            signature_records,
        )

        store = signature_records(_df(spark, CORPUS), "doc_id", "text", **kw)
        out = incremental_sig_dedup(
            store, _df(spark, BATCH), "doc_id", "text", **kw
        )
        return {r["id"]: (r["keep"], r["reason"]) for r in out.collect()}

    def test_classification_rules(self, spark):
        v = self._verdicts(spark)
        assert v[10] == (False, "exact_corpus")
        assert v[11] == (True, None)
        assert v[12] == (False, "exact_batch")
        assert v[13] == (False, "near_corpus")
        assert v[14] == (True, None)

    def test_agrees_with_exact_on_hash_rules(self, spark):
        from shaper_spark.operators.dedup import incremental_dedup

        v = self._verdicts(spark)
        exact = {
            r["id"]: (r["keep"], r["reason"])
            for r in incremental_dedup(
                _df(spark, CORPUS), _df(spark, BATCH), "doc_id", "text"
            ).collect()
        }
        # the exact rules are hash-identical between the two regimes
        for i, (_, reason) in exact.items():
            if reason in ("exact_corpus", "exact_batch"):
                assert v[i] == exact[i]

    def test_disjoint_batch_all_kept(self, spark):
        from shaper_spark.operators.dedup import (
            incremental_sig_dedup,
            signature_records,
        )

        store = signature_records(_df(spark, CORPUS), "doc_id", "text")
        batch = _df(
            spark,
            [
                (20, "entirely novel words nowhere in the corpus vocabulary set one"),
                (21, "another fresh document with its own private token stream two"),
            ],
        )
        out = incremental_sig_dedup(store, batch, "doc_id", "text")
        assert all(r["keep"] for r in out.collect())


class TestSigDedupStream:
    def test_stream_maintains_store_and_corpus(self, spark, tmp_path):
        from shaper_spark.streaming import (
            bootstrap_signature_table,
            start_corpus_sig_dedup_stream,
        )

        import shutil

        for t in ("sg_corpus", "sg_sigs", "sg_rejects"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            # a crashed prior run can orphan the managed location
            shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        _df(spark, CORPUS).write.saveAsTable("sg_corpus")
        spark.sql(
            "CREATE TABLE sg_rejects (doc_id INT, reason STRING) USING parquet"
        )
        n = bootstrap_signature_table(spark, "sg_corpus", "sg_sigs")
        assert n == len(CORPUS)

        src = tmp_path / "src"
        src.mkdir()
        ckpt = tmp_path / "ckpt"
        import json

        (src / "b1.json").write_text(
            "\n".join(
                json.dumps({"doc_id": i, "text": t}) for i, t in BATCH
            )
        )
        stream = (
            spark.readStream.schema("doc_id int, text string")
            .json(str(src))
        )
        q = start_corpus_sig_dedup_stream(
            stream,
            "sg_corpus",
            "sg_sigs",
            checkpoint=str(ckpt),
            trigger_available_now=True,
            rejects_table="sg_rejects",
        )
        assert q.awaitTermination(120), "stream did not drain in time"

        kept = sorted(r["doc_id"] for r in spark.table("sg_corpus").collect())
        assert kept == [1, 2, 3, 11, 14]
        # the store grew by exactly the kept batch docs
        sig_ids = sorted(r["id"] for r in spark.table("sg_sigs").collect())
        assert sig_ids == [1, 2, 3, 11, 14]
        rejects = {
            r["doc_id"]: r["reason"]
            for r in spark.table("sg_rejects").collect()
        }
        assert rejects == {
            10: "exact_corpus",
            12: "exact_batch",
            13: "near_corpus",
        }

        # second batch: a dup of a doc KEPT IN BATCH 1 must now be
        # caught via the incrementally-appended signatures
        (src / "b2.json").write_text(
            json.dumps(
                {
                    "doc_id": 30,
                    "text": "a completely different document about "
                    "distributed query engines at scale",
                }
            )
            + "\n"
            + json.dumps({"doc_id": 31, "text": "yet another brand new document full of words unseen before now"})
        )
        q = start_corpus_sig_dedup_stream(
            spark.readStream.schema("doc_id int, text string").json(str(src)),
            "sg_corpus",
            "sg_sigs",
            checkpoint=str(ckpt),
            trigger_available_now=True,
            rejects_table="sg_rejects",
        )
        assert q.awaitTermination(120)
        kept = sorted(r["doc_id"] for r in spark.table("sg_corpus").collect())
        assert kept == [1, 2, 3, 11, 14, 31]
        assert (
            spark.table("sg_rejects")
            .filter("doc_id = 30")
            .collect()[0]["reason"]
            == "exact_corpus"
        )
        for t in ("sg_corpus", "sg_sigs", "sg_rejects"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


class TestLshParameterPlan:
    """r12: fixed-point banding calibration (engine-bit-identical)."""

    def test_shape_and_monotonicity(self, spark):
        from shaper_spark.operators.dedup import lsh_parameter_plan

        rows = lsh_parameter_plan(spark).collect()
        assert len(rows) == 35  # 7 power-of-two splits x 5 thresholds
        by_split = {}
        for r in rows:
            assert r.bands * r.rows_per_band == 64
            assert 0 <= r.p_collide_micro <= 1_000_000
            by_split.setdefault(r.bands, []).append(
                (r.t_micro, r.p_collide_micro)
            )
        # p is non-decreasing in the threshold for every split
        for pts in by_split.values():
            ps = [p for _, p in sorted(pts)]
            assert ps == sorted(ps)
        # the classic b=16,r=4 split: steep S-curve around ~0.5
        s16 = dict(by_split[16])
        assert s16[300000] < 200000 < 800000 < s16[900000]

    def test_matches_duckdb_bit_for_bit(self, spark):
        import duckdb

        from shaper_spark.operators.dedup import (
            lsh_parameter_plan,
            lsh_parameter_plan_sql,
        )

        got = sorted(tuple(r) for r in lsh_parameter_plan(spark).collect())
        want = sorted(
            duckdb.sql(lsh_parameter_plan_sql(int_div="//")).fetchall()
        )
        assert got == want

    def test_rejects_non_power_of_two(self, spark):
        import pytest as _pytest

        from shaper_spark.operators.dedup import lsh_parameter_plan

        with _pytest.raises(ValueError):
            lsh_parameter_plan(spark, n_hashes=48)
