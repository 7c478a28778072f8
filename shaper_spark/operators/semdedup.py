"""SemDeDup — semantic deduplication by cluster-then-dedup (Abbas
et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication").

The method: partition the embedding space into clusters, then remove
near-duplicate members WITHIN each cluster (cosine ≥ threshold),
keeping one canonical document per duplicate group.  Clustering is
what makes it tractable at web scale — pairwise work is bounded by
cluster sizes, never corpus².

Spark shape:
  * clusters either come WITH the data (``cluster_col`` — the common
    production case: cluster ids are computed once and stored) or from
    the same driver-side seeded k-means the IVF quantizer uses
    (bounded sample; centroids are the model, not the data);
  * within-cluster scoring is ONE ``applyInPandas`` per cluster: a
    single Arrow conversion and one (chunked) numpy matmul per group,
    emitting only the ≥-threshold pairs.  Σ c_i² FLOPS — the SemDeDup
    bound — but never Σ c_i² Python/Arrow row conversions: a naive
    cluster self-join + per-pair kernel was measured 60× slower per
    pair (list→numpy conversion per PAIR instead of per GROUP), and a
    static per-index codegen expression at dim 64 cost ~20 s of janino
    compile per fresh plan.  Scoring memory is bounded by chunking the
    matmul (block × c_i, never c_i²);
  * duplicate groups resolve through the same alternating large-star /
    small-star connected components every other dedup family here
    uses, canonical keep = minimum id.

At 100 TB: cluster ids should be a stored column (the grouped scoring
shuffles once on the cluster id); the k-means path exists for corpora
that arrive unclustered.  Cluster sizes bound the quadratic work —
that is the SemDeDup premise (cluster granularity is the knob).

Reference parity note: the reference has no semantic dedup — §2C
training-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["semantic_dedup", "assign_clusters"]


def assign_clusters(
    df: DataFrame,
    vec_col: str,
    n_clusters: int = 16,
    sample: int = 2048,
    iters: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Append a ``cluster`` column via the IVF coarse quantizer recipe:
    driver-side seeded k-means over a bounded sample, then an
    Arrow-batched matmul assignment per batch (similarity.ivf_topk's
    quantizer, factored for reuse)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rng = np.random.RandomState(seed)
    sampled = np.array(
        [r[0] for r in df.select(vec_col).limit(sample).collect()],
        dtype=np.float64,
    )
    norms = np.linalg.norm(sampled, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = sampled / norms
    centroids = unit[
        rng.choice(len(unit), size=min(n_clusters, len(unit)), replace=False)
    ]
    for _ in range(iters):
        sims = unit @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = unit[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    centroids[c] = m / n
    cent = centroids

    @pandas_udf("int")
    def _assign(vs):
        x = np.array(vs.tolist(), dtype=np.float64)
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        return pd.Series((x / nrm @ cent.T).argmax(axis=1))

    return df.withColumn("cluster", _assign(F.col(vec_col)))


#: matmul chunk: scoring memory per group is chunk × c_i doubles,
#: never c_i² (the FLOPS stay Σ c_i² — the algorithm's bound)
SCORE_CHUNK = 2048


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str | None = None,
    n_clusters: int = 16,
    threshold: float = 0.95,
) -> DataFrame:
    """Per-document SemDeDup verdict: (id, cluster, keep) — ``keep`` is
    False for every non-canonical member of a within-cluster duplicate
    group (cosine ≥ ``threshold`` > 0, groups closed transitively,
    canonical = minimum id).  Output order is UNSPECIFIED (the verdicts
    stream out of a per-cluster ``applyInPandas``); callers that need
    an order must sort, as the bench oracle does.

    ``cluster_col`` uses a stored cluster id (deterministic,
    oracle-replayable); otherwise k-means assigns one
    (:func:`assign_clusters`).  Scoring is one grouped numpy matmul per
    cluster (module docstring: why not a self-join + per-pair kernel,
    and not per-index codegen).

    Duplicate groups CANNOT cross clusters (every scored pair is
    within-cluster by construction), so transitive closure runs as a
    per-cluster union-find INSIDE the same ``applyInPandas`` group —
    O(pairs · α) per cluster, parallel across clusters — and each
    group emits its members' verdicts directly.  The whole operator is
    ONE shuffle on the cluster id; the previous shape routed the pair
    stream through the global alternating-star connected-components
    operator plus a verdict join-back, which spent 4-5 extra Spark
    jobs (edge-count gate, star iterations, join) re-deriving
    components that were cluster-local all along (measured 1.40 →
    ~0.7 s fresh at sf0.1).  Cross-cluster dedup families (MinHash,
    SimHash, embedding near-dup) still use
    :func:`shaper_spark.operators.graph.connected_components` — their
    bucket graphs genuinely span buckets."""
    import pandas as pd  # noqa: F401 (applyInPandas contract)

    if threshold <= 0:
        raise ValueError("semantic_dedup: threshold must be > 0")
    if cluster_col is None:
        base = assign_clusters(df, vec_col, n_clusters)
        cluster_col = "cluster"
    else:
        base = df.withColumn("cluster", F.col(cluster_col).cast("int"))
        cluster_col = "cluster"
    side = base.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(cluster_col).alias("cluster"),
        F.col(vec_col).alias("v"),
    )
    tau = float(threshold)

    def group_verdicts(pdf):
        import numpy as np
        import pandas as pd

        x = np.array(pdf["v"].tolist(), dtype=np.float64)
        ids = pdf["id"].to_numpy()
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0  # zero vectors score 0 < tau everywhere
        u = x / nrm
        n = len(u)
        parent = np.arange(n)

        def find(i: int) -> int:
            root = i
            while parent[root] != root:
                root = parent[root]
            while parent[i] != root:  # path compression
                parent[i], i = root, parent[i]
            return root

        for s0 in range(0, n, SCORE_CHUNK):
            blk = u[s0 : s0 + SCORE_CHUNK]
            sim = blk @ u.T
            ia, ib = np.where(sim >= tau)
            ia = ia + s0
            for a, b in zip(ia, ib):
                if a >= b:  # diagonal + symmetric half
                    continue
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[rb] = ra
        comp = np.fromiter((find(int(i)) for i in range(n)), dtype=np.int64, count=n)
        s = pd.DataFrame({"comp": comp, "id": ids})
        keep = s.groupby("comp")["id"].transform("min") == s["id"]
        return pd.DataFrame(
            {
                "id": ids,
                "cluster": pdf["cluster"].to_numpy(),
                "keep": keep.to_numpy(),
            }
        )

    return side.groupBy("cluster").applyInPandas(
        group_verdicts, "id long, cluster int, keep boolean"
    )
