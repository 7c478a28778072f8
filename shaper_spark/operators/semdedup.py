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
  * within-cluster candidate pairs are an equi-join on the cluster id
    with ``id_a < id_b`` — Σ c_i² pair work, the SemDeDup bound;
  * cosine is the Arrow-batched numpy kernel (veckernel.pair_cosine);
  * duplicate groups resolve through the same alternating large-star /
    small-star connected components every other dedup family here
    uses, canonical keep = minimum id.

At 100 TB: cluster ids should be a stored column (bucketed by cluster
for a shuffle-free self-join); the k-means path exists for corpora
that arrive unclustered.

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


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str | None = None,
    n_clusters: int = 16,
    threshold: float = 0.95,
    dim: int | None = None,
) -> DataFrame:
    """Per-document SemDeDup verdict: (id, cluster, keep) — ``keep`` is
    False for every non-canonical member of a within-cluster duplicate
    group (cosine ≥ ``threshold``, groups closed transitively,
    canonical = minimum id).  Ordered by id.

    ``cluster_col`` uses a stored cluster id (deterministic,
    oracle-replayable); otherwise k-means assigns one
    (:func:`assign_clusters`).  Pass ``dim`` (≤ 128) to evaluate the
    pair cosine as a STATIC whole-stage-codegen sum of indexed terms —
    all-JVM, no Python worker in the hot path (the minhash
    signature-match trick); wider vectors fall back to the Arrow numpy
    kernel, whose batch matmul wins once the expression tree would
    outgrow codegen."""
    from .graph import connected_components
    from .veckernel import pair_cosine

    if cluster_col is None:
        base = assign_clusters(df, vec_col, n_clusters)
        cluster_col = "cluster"
    else:
        base = df.withColumn("cluster", F.col(cluster_col).cast("int"))
        cluster_col = "cluster"
    side = base.select(
        F.col(id_col).alias("id"),
        F.col(cluster_col).alias("cluster"),
        F.col(vec_col).alias("v"),
    )
    a = side.alias("a")
    b = side.alias("b")
    if dim is not None and dim <= 128:
        dot = sum(
            F.col("a.v")[i] * F.col("b.v")[i] for i in range(dim)
        )
        na = F.sqrt(sum(F.col("a.v")[i] ** 2 for i in range(dim)))
        nb = F.sqrt(sum(F.col("b.v")[i] ** 2 for i in range(dim)))
        cos = F.when((na * nb) > 0, dot / (na * nb))
    else:
        cos = pair_cosine(F.col("a.v"), F.col("b.v"))
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )
    cc = connected_components(pairs, "id_a", "id_b")
    dropped = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("id"), F.lit(False).alias("__drop")
    )
    # no broadcast hint: the dropped set scales with the dup fraction
    # (statistics pick the strategy; at 100 TB this is a keyed join)
    return (
        side.select("id", "cluster")
        .join(dropped, "id", "left")
        .select(
            "id",
            "cluster",
            F.col("__drop").isNull().alias("keep"),
        )
        .orderBy("id")
    )
