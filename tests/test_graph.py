"""Connected components (large-star/small-star) and cluster resolution."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from shaper_spark.operators.graph import connected_components, dedup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_single_chain_collapses_to_min(spark):
    # a long path is the worst case for label propagation; the star
    # algorithm still converges in O(log^2 n) alternations
    out = _cc(spark, [(i, i + 1) for i in range(1, 30)])
    assert set(out.values()) == {1}
    assert set(out) == set(range(1, 31))


def test_two_components(spark):
    out = _cc(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == out[12] == 10


def test_self_loops_and_duplicates(spark):
    out = _cc(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert out[5] == 5
    assert out[1] == out[2] == 1


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randint(1, 60), rng.randint(1, 60)) for _ in range(80)]
    # reference union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for a, b in edges:
        for n in (a, b):
            want[n] = find(n)
    # normalize: component label = min member
    comp_min = {}
    for n, c in want.items():
        comp_min.setdefault(c, n)
        comp_min[c] = min(comp_min[c], n)
    want = {n: comp_min[c] for n, c in want.items()}
    assert _cc(spark, edges) == want


def test_dedup_clusters_summary(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["id_a", "id_b"]
    )
    rows = {
        r["component"]: r.asDict()
        for r in dedup_clusters(pairs).collect()
    }
    assert rows[1]["n_members"] == 3 and rows[1]["keep_id"] == 1
    assert rows[7]["n_members"] == 2 and rows[7]["keep_id"] == 7


def test_output_has_each_node_once(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (4, 4)], ["src", "dst"])
    out = connected_components(df)
    assert out.groupBy("node").count().filter(F.col("count") > 1).count() == 0


def test_apply_dedup_keeps_canonicals_and_untouched(spark):
    from shaper_spark.operators.graph import apply_dedup

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 11)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["id_a", "id_b"]
    )
    kept = sorted(
        r["doc_id"] for r in apply_dedup(docs, pairs, "doc_id").collect()
    )
    # clusters {1,2,3} -> keep 1; {7,9} -> keep 7; everyone else untouched
    assert kept == [1, 4, 5, 6, 7, 8, 10]


def test_apply_dedup_agrees_with_cluster_keep_ids(spark):
    from pyspark.sql import functions as F

    from shaper_spark.operators.dedup import jaccard_pairs
    from shaper_spark.operators.graph import apply_dedup, dedup_clusters

    docs = spark.table("documents").limit(300)
    pairs = jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    kept = {r["doc_id"] for r in apply_dedup(docs, pairs, "doc_id").collect()}
    clusters = dedup_clusters(pairs).collect()
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    in_cluster = {
        r["node"]
        for r in __import__(
            "shaper_spark.operators.graph", fromlist=["connected_components"]
        ).connected_components(pairs, "id_a", "id_b").collect()
    }
    expected = (all_ids - in_cluster) | {r["keep_id"] for r in clusters}
    assert kept == expected


def test_distributed_path_matches_driver_fast_path(spark, monkeypatch):
    """Force the large-star/small-star loop (the 100 TB path) and pin it
    to the driver union-find's output on a random graph."""
    import random

    from shaper_spark.operators import graph

    rng = random.Random(13)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(120)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = {
        (r["node"], r["component"])
        for r in graph.connected_components(df).collect()
    }
    monkeypatch.setattr(graph, "CC_DRIVER_EDGE_CAP", 0)
    dist = {
        (r["node"], r["component"])
        for r in graph.connected_components(df).collect()
    }
    assert fast == dist


class TestClusterSizeHistogram:
    """r12: dup-family size distribution over the component labeling."""

    def test_histogram_counts(self, spark):
        from shaper_spark.operators.graph import cluster_size_histogram

        # components: {1,2,3} (via 1-2, 2-3), {10,11}, {20} isolated
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 20)],
            "id_a long, id_b long",
        )
        rows = {
            r.cluster_size: (r.n_clusters, r.n_docs, r.n_removable)
            for r in cluster_size_histogram(pairs).collect()
        }
        assert rows[3] == (1, 3, 2)
        assert rows[2] == (1, 2, 1)
        assert rows[1] == (1, 1, 0)

    def test_removable_matches_apply_dedup(self, spark):
        from shaper_spark.operators.graph import (
            apply_dedup,
            cluster_size_histogram,
        )

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        docs = spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id long"
        )
        hist = cluster_size_histogram(pairs)
        removable = sum(
            r.n_removable for r in hist.collect()
        )
        kept = apply_dedup(docs, pairs, "doc_id").count()
        assert docs.count() - kept == removable
