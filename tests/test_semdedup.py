"""SemDeDup (operators/semdedup.py): within-cluster cosine dedup with
transitive groups and min-id canonicals, in both stored-cluster and
k-means modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "id int, cluster int, v array<double>"
    )


class TestSemanticDedup:
    def test_within_cluster_groups_and_canonicals(self, spark):
        from shaper_spark.operators.semdedup import semantic_dedup

        rows = [
            # cluster 0: 1≈2≈3 (transitive chain), 4 distinct
            (1, 0, [1.0, 0.0, 0.0]),
            (2, 0, [0.999, 0.04, 0.0]),
            (3, 0, [0.995, 0.09, 0.0]),
            (4, 0, [0.0, 1.0, 0.0]),
            # cluster 1: 5≈6; 7 is IDENTICAL to 1 but in another
            # cluster — SemDeDup must NOT drop across clusters
            (5, 1, [0.0, 0.0, 1.0]),
            (6, 1, [0.0, 0.03, 0.999]),
            (7, 1, [1.0, 0.0, 0.0]),
        ]
        out = semantic_dedup(
            _vecs(spark, rows), "id", "v", cluster_col="cluster",
            threshold=0.95,
        )
        verdict = {r["id"]: r["keep"] for r in out.collect()}
        assert verdict == {
            1: True, 2: False, 3: False, 4: True,
            5: True, 6: False, 7: True,
        }

    def test_kmeans_mode_splits_separated_clouds(self, spark):
        from shaper_spark.operators.semdedup import (
            assign_clusters,
            semantic_dedup,
        )

        # two well-separated clouds with a near-dup pair inside each
        rows = [
            (1, 0, [1.0, 0.01, 0.0]),
            (2, 0, [1.0, 0.02, 0.0]),
            (3, 0, [0.0, 0.01, 1.0]),
            (4, 0, [0.0, 0.02, 1.0]),
        ]
        df = _vecs(spark, rows).drop("cluster")
        assigned = assign_clusters(df, "v", n_clusters=2, sample=4)
        groups = {
            r["id"]: r["cluster"] for r in assigned.collect()
        }
        assert groups[1] == groups[2] and groups[3] == groups[4]
        assert groups[1] != groups[3]
        out = semantic_dedup(df, "id", "v", n_clusters=2, threshold=0.95)
        verdict = {r["id"]: r["keep"] for r in out.collect()}
        assert verdict == {1: True, 2: False, 3: True, 4: False}

    def test_empty_pairs_all_kept(self, spark):
        from shaper_spark.operators.semdedup import semantic_dedup

        rows = [
            (1, 0, [1.0, 0.0, 0.0]),
            (2, 0, [0.0, 1.0, 0.0]),
            (3, 1, [0.0, 0.0, 1.0]),
        ]
        out = semantic_dedup(
            _vecs(spark, rows), "id", "v", cluster_col="cluster"
        )
        assert all(r["keep"] for r in out.collect())

    def test_chunked_scoring_matches_unchunked(self, spark, monkeypatch):
        """Force SCORE_CHUNK below the cluster size so pairs span chunk
        boundaries; the verdict must be identical."""
        from shaper_spark.operators import semdedup as S

        rows = [
            (1, 0, [1.0, 0.0, 0.0]),
            (2, 0, [0.999, 0.04, 0.0]),
            (3, 0, [0.0, 1.0, 0.0]),
            (4, 0, [0.995, 0.09, 0.0]),
            (5, 1, [0.0, 0.0, 1.0]),
            (6, 1, [0.0, 0.03, 0.999]),
        ]
        df = _vecs(spark, rows)
        full = sorted(
            tuple(r)
            for r in S.semantic_dedup(
                df, "id", "v", cluster_col="cluster"
            ).collect()
        )
        monkeypatch.setattr(S, "SCORE_CHUNK", 2)
        chunked = sorted(
            tuple(r)
            for r in S.semantic_dedup(
                df, "id", "v", cluster_col="cluster"
            ).collect()
        )
        assert full == chunked
        verdict = dict((t[0], t[2]) for t in full)
        assert verdict == {
            1: True, 2: False, 3: True, 4: False, 5: True, 6: False
        }

    def test_zero_threshold_rejected(self, spark):
        from shaper_spark.operators.semdedup import semantic_dedup

        with pytest.raises(ValueError, match="threshold"):
            semantic_dedup(
                _vecs(spark, [(1, 0, [1.0])]), "id", "v",
                cluster_col="cluster", threshold=0.0,
            )
