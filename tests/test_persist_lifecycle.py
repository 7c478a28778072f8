"""r14: release handles for corpus-scale persists (r13 VERDICT #4 /
ADVICE). Operators that persist per-token/per-shingle frames must
expose them on the returned DataFrame so a long-lived session can
unpersist after the last action instead of accumulating cache blocks
until session stop. Results must be identical with the handle present
and after release."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _release(df):
    for f in getattr(df, "_cached_frames", ()):
        f.unpersist()
    cached = getattr(df, "_cached", None)
    if cached is not None:
        cached.unpersist()


class TestPersistLifecycle:
    def test_dup_span_stats_handle(self, spark):
        from shaper_spark.operators.dupspans import duplicated_span_stats

        docs = spark.table("documents").limit(100)
        out = duplicated_span_stats(docs, "doc_id", "text")
        assert out._cached is not None
        rows = out.collect()
        assert rows
        _release(out)
        assert out._cached.storageLevel.useMemory is False

    def test_decontam_handle(self, spark):
        from shaper_spark.operators.decontam import ngram_decontaminate

        docs = spark.table("documents")
        train = docs.filter(F.col("doc_id") % 3 != 0).limit(100)
        ev = docs.filter(F.col("doc_id") % 3 == 0).limit(40)
        out = ngram_decontaminate(
            train, ev, "doc_id", "text", n=4, max_df=50
        )
        assert out._cached is not None
        out.collect()
        _release(out)
        assert out._cached.storageLevel.useMemory is False
        # without the df cap there is one consumer, no persist, no handle
        out2 = ngram_decontaminate(train, ev, "doc_id", "text", n=4)
        assert getattr(out2, "_cached", None) is None

    def test_incremental_dedup_handles(self, spark):
        from shaper_spark.operators.dedup import incremental_dedup

        docs = spark.table("documents")
        corpus = docs.filter(F.col("doc_id") % 5 != 0).limit(150)
        batch = docs.filter(F.col("doc_id") % 5 == 0).limit(40)
        out = incremental_dedup(corpus, batch, "doc_id", "text")
        assert len(out._cached_frames) == 3
        out.collect()
        _release(out)
        for f in out._cached_frames:
            assert f.storageLevel.useMemory is False

    def test_minhash_estimate_report_handles(self, spark):
        from shaper_spark.operators.dedup import minhash_estimate_report

        docs = spark.table("documents").limit(80)
        out = minhash_estimate_report(docs, "doc_id", "text")
        assert len(out._cached_frames) == 2
        out.collect()
        _release(out)
        for f in out._cached_frames:
            assert f.storageLevel.useMemory is False


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
