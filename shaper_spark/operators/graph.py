"""Distributed connected components for duplicate-cluster resolution.

The dedup family (jaccard_pairs / minhash / simhash / embedding
near-dup) emits *pairs*; turning pairs into clusters — so one canonical
document per duplicate group survives — is a connected-components
problem. This implements the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014): converges in O(log² n) rounds independent of
component diameter, each round two hash-shuffles — the formulation that
survives 100 TB edge lists, unlike label propagation whose round count
grows with the longest duplicate chain.

Every round materializes with persist + count and truncates lineage
(``localCheckpoint``) so the iterative plan doesn't stack — the classic
Spark iterative-algorithm footgun.

Reference parity note: the reference has no graph/cluster operator —
§2C training-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "connected_components",
    "dedup_clusters",
    "apply_dedup",
    "cluster_size_histogram",
]

# Driver fast-path cutoff: candidate pair lists are post-threshold and
# typically ORDERS OF MAGNITUDE smaller than the corpus, so when the
# edge list fits comfortably on the driver a single union-find pass
# replaces the whole iterative alternation (each distributed round is
# 4+ jobs of fixed scheduling cost — the dominant term at dashboard
# scale). Output is identical (component = min node id). Above the cap
# the large-star/small-star loop takes over — the 100 TB path. Same
# bounded-strategy pattern as dedup.NEARDUP_BYTES_BUDGET; module-level
# so tests can force the distributed path.
CC_DRIVER_EDGE_CAP = 2_000_000


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the
    minimum of N(u) ∪ {u}."""
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct every edge high→low, then for each node u connect u and
    all its (≤) neighbors to the minimum neighbor."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = directed.groupBy("src").agg(F.min("dst").alias("m"))
    lo = (
        directed.join(m, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    hi = m.select(F.col("src"), F.col("m").alias("dst"))
    return lo.union(hi).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = smallest node id in the node's connected component.
    Undirected interpretation; self-loops and duplicate edges are fine.

    Converges when an alternation round leaves the (node → min
    neighbor) map unchanged — checked with one count per round on a
    checksum-joined frame, not a collect.

    Edge lists up to :data:`CC_DRIVER_EDGE_CAP` resolve in one driver
    union-find pass instead (identical output; see the cutoff's
    comment)."""
    from pyspark import StorageLevel

    probe = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    # persist before sizing: a bare limit(cap).collect() would re-run
    # the (often expensive) upstream pair pipeline through Spark's
    # incremental-limit partition scaling, and the distributed loop
    # would re-run it again per round. One execution either way.
    probe = probe.persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = probe.count()
    if n_edges <= CC_DRIVER_EDGE_CAP:
        head = probe.collect()
        probe.unpersist()
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in head:
            a, b = r[0], r[1]
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                # larger root points to smaller: every root stays the
                # minimum of its merged set, so final root = component
                # minimum (each node started as its own root)
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        out = [(n, find(n)) for n in parent]
        spark = edges.sparkSession
        field = edges.schema[src].dataType.simpleString()
        schema = f"node {field}, component {field}"
        if not out:
            return spark.createDataFrame([], schema)
        return spark.createDataFrame(out, schema)
    e = (
        probe
        .distinct()
        .localCheckpoint()
    )
    probe.unpersist()  # localCheckpoint materialized its own copy
    all_nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        # Fixed point: identical edge sets (both are distinct frames).
        changed = (
            e2.join(e, ["src", "dst"], "left_anti").limit(1).count() > 0
            or e.join(e2, ["src", "dst"], "left_anti").limit(1).count() > 0
        )
        e = e2
        if not changed:
            break
    # At the fixed point the edge set is a star forest: every edge is
    # (member, root) with member ≠ root. Roots — and nodes isolated by
    # self-loop-only input, which the star steps drop entirely — are
    # exactly the nodes absent from the member side; they are their own
    # component minimum.
    members = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    rest = all_nodes.join(members.select("node"), "node", "left_anti")
    return members.union(rest.select("node", F.col("node").alias("component")))


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Duplicate-cluster summary from a near-dup pair list:
    (component, n_members, keep_id) — ``keep_id`` is the canonical
    (minimum-id) member, the standard keep-first dedup rule."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("keep_id"),
    )


def cluster_size_histogram(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Duplicate-family size distribution — the release-report view of
    a dedup pass: ``(cluster_size, n_clusters, n_docs, n_removable)``
    where ``n_removable = (size-1)·n_clusters`` is exactly the row
    count :func:`apply_dedup` would drop.  How concentrated the
    duplication is (many pairs vs a few giant families) decides
    whether near-dup removal is worth its cost on a corpus.

    Spark shape: one extra TINY hash-agg over the component labeling
    (already bounded by documents appearing in any candidate pair) —
    no additional corpus scan, no shuffle beyond the labeling's own.
    Exact integers throughout."""
    comps = dedup_clusters(pairs, id_a, id_b)
    return (
        comps.groupBy("n_members")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("n_members").alias("cluster_size"),
            "n_clusters",
            (F.col("n_members") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("n_members") - 1) * F.col("n_clusters")).alias(
                "n_removable"
            ),
        )
    )


def apply_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The ACTION step that closes the near-dup loop: candidate pairs →
    connected components → the CLEANED CORPUS. Keeps every document
    that is not a non-canonical member of a duplicate cluster
    (keep-lowest-id rule — the same canonical ``dedup_clusters``
    reports). Documents that appear in no pair pass through untouched.

    Spark shape: the drop set is ``component ≠ node`` rows of the
    O(log² n) large-star/small-star labeling (bounded by documents that
    occur in ANY candidate pair, not the corpus), removed with one
    anti-join on the id — broadcast when the drop set is small, keyed
    shuffle otherwise."""
    drop = (
        connected_components(pairs, id_a, id_b)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    return docs.join(drop, id_col, "left_anti")
