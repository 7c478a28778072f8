"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design notes (the point of this module):

* Exact dedup is a single hash aggregate — one shuffle on the content
  hash, map-side partial aggregation for free.
* Jaccard / MinHash avoid the O(n²) all-pairs comparison: candidate pairs
  come from a *posting-list self-join* (shingle → docs) or *LSH band
  buckets* (band-hash → docs). The shuffle key is the shingle/bucket, so
  work scales with Σ bucket² not n². Hot shingles are dropped via a
  document-frequency cap (`max_df`) — the classic stop-shingle
  optimization that keeps the join skew-free at 100 TB.
* All hashing is md5-based and engine-portable, so a DuckDB oracle can
  reproduce signatures bit-for-bit (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "exact_duplicates",
    "dedup_exact",
    "shingle_tokens",
    "jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash",
    "simhash_near_dups",
    "embedding_near_dups",
    "normalize_text_expr",
    "dedup_exact_normalized",
    "incremental_dedup",
    "minhash_estimate_report",
    "signature_records",
    "incremental_sig_dedup",
    "lsh_parameter_plan",
    "lsh_parameter_plan_sql",
    "dedup_flow_matrix",
    "jaccard_threshold_curve",
    "split_leakage_report",
    "dedup_quality_shift",
    "method_agreement_report",
    "dedup_pair_exemplars",
]

# Small-corpus strategy cutoff for embedding_near_dups: take the
# driver-local path only when the whole corpus matrix fits in
# NEARDUP_BYTES_BUDGET (rows × dim × 8 bytes) and under the row cap —
# the broadcast regime, where even a distributed plan would ship the
# matrix whole into every task. Module-level so tests can force the
# distributed path on small fixtures.
NEARDUP_BYTES_BUDGET = 100 << 20
NEARDUP_ROW_CAP = 200_000


def exact_duplicates(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Groups of byte-identical rows: (content_hash, n_docs, doc_ids).

    One shuffle on the md5 of the concatenated columns; partial counts
    combine map-side."""
    cols = cols or df.columns
    fingerprint = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
    return (
        df.select(fingerprint.alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


def normalize_text_expr(col) -> "F.Column":
    """Canonical text-normalization expression for fuzzy-ish exact
    dedup (the CCNet/C4 pre-dedup step): ASCII-lowercase, strip
    non-[a-z0-9 space], collapse whitespace runs, trim. Pure codegen'd
    built-ins; every regex here means the same thing in Java regex and
    RE2, so a DuckDB oracle replays it (with the 'g' flag — DuckDB's
    regexp_replace is first-match-only by default, Spark's is global)."""
    x = F.lower(col)
    x = F.regexp_replace(x, "[^a-z0-9 ]", "")
    x = F.regexp_replace(x, " +", " ")
    return F.trim(x)


def dedup_exact_normalized(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Keep the lowest-id row per NORMALIZED-content group: exact dedup
    made robust to case/punctuation/whitespace variants. Same
    single-shuffle min-by shape as ``dedup_exact``; the normalization
    runs inside the scan projection, so it adds no pass."""
    winners = (
        df.withColumn("__h", F.md5(normalize_text_expr(F.col(text_col))))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(winners, id_col, "left_semi")


def dedup_exact(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per content group (deterministic winner).

    Expressed as min-by aggregate, not a window over the whole table —
    a single shuffle on the content key and no per-group sort."""
    fingerprint = F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    )
    winners = (
        df.withColumn("__h", fingerprint)
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(winners, id_col, "left_semi")


def shingle_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct k-word shingles per document: (id, [extras...], shingle).

    ``extra_cols`` (columns functionally dependent on the document id,
    e.g. a split label) ride the projection for free — same source row,
    pre-explode — so consumers never join back to the corpus for them.

    posexplode(split) + window lead(k−1) — every operator here is
    codegen'd or natively vectorized. Two alternatives were measured
    and rejected at sf0.1:

    * lambda-HOF ``transform(sequence(...), i -> ...)``: ~100× slower
      per core — HOFs bypass whole-stage codegen and re-evaluate a
      lambda tree with an O(k) array copy per element.
    * window-free ``explode(sequence) + slice(words, i, k)``: faster as
      a standalone single-use stream (and used for that shape in
      dupspans.py / repetition bigrams), but 3.5× SLOWER end-to-end
      inside ``jaccard_pairs``'s persist + posting-list self-join
      (steady-state 2.25 s vs 0.63 s, identical output and cache hits
      both ways) — A/B in-place before changing this function.

    The window shuffles on the document id — embarrassingly parallel,
    no skew (docs are bounded).

    Round-5 re-measure: the crossover is k.  At k=3 the lead-chain wins
    (the jaccard A/B above); at k=8 the lead-chain evaluates SEVEN
    window columns and loses 2× to slice+sequence (1.41 s vs 0.75 s at
    sf0.1, distinct included, identical output) — so the construction
    is picked per k, same (id, shingle) set either way."""
    from pyspark.sql import Window

    from ..session import spread_for_compute

    extras = list(extra_cols)
    if k >= 5:
        arr = (
            spread_for_compute(df, heavy=True)
            .select(
                F.col(id_col).alias("id"),
                *[F.col(c) for c in extras],
                F.split(F.col(text_col), " ").alias("__ws"),
            )
            .filter(F.size("__ws") >= k)
        )
        n = F.size("__ws")
        return (
            arr.select(
                "id",
                *extras,
                F.explode(F.sequence(F.lit(1), n - (k - 1))).alias("__i"),
                "__ws",
            )
            .select(
                "id",
                *extras,
                F.concat_ws(
                    " ", F.slice("__ws", F.col("__i"), k)
                ).alias("shingle"),
            )
            .filter(F.length("shingle") > 0)
            .distinct()
        )

    toks = spread_for_compute(df, heavy=True).select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extras],
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    last = parts[-1]
    shingle = F.concat_ws(" ", *parts)
    return (
        toks.select(
            "id", *extras, last.alias("__last"), shingle.alias("shingle")
        )
        .filter(F.col("__last").isNotNull() & (F.length("shingle") > 0))
        .select("id", *extras, "shingle")
        .distinct()
    )


def _df_capped(postings: DataFrame, max_df: int | None) -> DataFrame:
    """Drop shingles appearing in more than max_df documents (stop-shingle
    pruning — they generate O(df²) pairs and carry no signal)."""
    if max_df is None:
        return postings
    hot = (
        postings.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("shingle")
    )
    return postings.join(hot, "shingle", "left_anti")


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs from a posting-list
    self-join: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.

    |A∩B| falls out of the join group-count; |A∪B| = |A|+|B|−|A∩B| from
    per-doc shingle counts (broadcastable side table).

    ``persist`` caches the postings (MEMORY_AND_DISK): the self-join plus
    the size aggregate otherwise recompute the shingle pipeline three
    times (Catalyst's ReuseExchange doesn't unify them) — measured 2×
    end-to-end. Disable when postings exceed cluster storage."""
    postings = _df_capped(shingle_tokens(df, id_col, text_col, k), max_df)
    if persist:
        from pyspark import StorageLevel

        postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
    return _jaccard_from_postings(postings, threshold)


def _jaccard_from_postings(
    postings: DataFrame, threshold: float
) -> DataFrame:
    """Pair scores from an existing (id, shingle) postings frame — the
    seam composite reports share so the postings pipeline (and its
    persist) runs once per report, not once per consumer."""
    sizes = postings.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("ca"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("cb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("ca") + F.col("cb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.9,
    max_df: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Substring-containment candidates (r11): pairs scored by
    Broder's containment coefficient C = |A∩B| / min(|A|,|B|) over
    distinct k-gram sets.  When the smaller document is a verbatim
    token-substring of the larger (truncated wire copy, quote-inside-
    article, extended re-post), every one of its k-grams appears in
    the container, so C = 1.0 exactly — the dup family Jaccard
    under-scores (a tweet quoted in an article has tiny |A∪B| overlap
    but full containment).

    Spark shape: the same posting-list self-join as
    :func:`jaccard_pairs` (never all-pairs; ``max_df`` caps
    stop-shingle postings), with the min-size denominator.  The score
    is computed as a half-up BIGINT micro-division —
    ``(inter·2e6 + m) DIV (2m) / 1e6`` — so thresholds and output
    replay bit-identically on any engine (the threshold-sweep rule).
    Returns (id_a, id_b, containment), id_a < id_b, C ≥ threshold."""
    postings = _df_capped(shingle_tokens(df, id_col, text_col, k), max_df)
    if persist:
        from pyspark import StorageLevel

        postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = postings.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("ca"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("cb"))
    t_micro = int(round(float(threshold) * 1_000_000))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "__cmicro",
            F.expr(
                "(inter * 2000000L + least(ca, cb)) "
                "DIV (2L * least(ca, cb))"
            ),
        )
        .filter(F.col("__cmicro") >= F.lit(t_micro))
        .select(
            "id_a",
            "id_b",
            (F.col("__cmicro").cast("double") / F.lit(1000000.0)).alias(
                "containment"
            ),
        )
    )


def _portable_hash(col, seed: int):
    """32-bit hash from md5 — reproducible in any engine with md5+conv.

    xxhash64 would be faster JVM-side; md5 keeps the DuckDB oracle able
    to replay signatures exactly. Swap via the `hash_fn` seam if parity
    isn't needed."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 8), 16, 10
    ).cast("bigint")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    max_df: int | None = None,
) -> DataFrame:
    """MinHash signature per document: (id, sig array<bigint>).

    One explode over shingles × num_hashes min-aggregates (all partial,
    map-side combinable): sig[i] = min over shingles of H_i(shingle)."""
    postings = _df_capped(shingle_tokens(df, id_col, text_col, k), max_df)
    return _sig_from_postings(postings, num_hashes)


def _sig_from_postings(postings: DataFrame, num_hashes: int) -> DataFrame:
    """(id, sig) from an existing (id, shingle) postings frame — the
    seam that lets composite reports (minhash_estimate_report) derive
    signatures from ONE shared postings scan instead of re-running the
    whole shingle pipeline per consumer."""
    aggs = [
        F.min(_portable_hash(F.col("shingle"), i)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = postings.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def _sig_band_buckets(
    sig_df: DataFrame,
    num_hashes: int,
    bands: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Explode a (id, sig, [carry...]) frame into LSH band buckets:
    (id, [carry...], band, bucket) with bucket = md5 of the band's
    signature slice — the oracle-replayable banding every MinHash
    consumer here shares.  ``carry`` columns ride the explode (e.g. the
    signature itself, so a bucket join can estimate Jaccard without a
    second scan of the signature store)."""
    rows_per_band = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col("sig")[i].cast("string")
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig_df.select(
        "id", *carry, F.explode(F.array(*band_cols)).alias("bb")
    ).select(
        "id",
        *carry,
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_df: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become a
    candidate pair. Shuffle key = (band index, band hash) — pair count
    scales with bucket sizes, never n². Signatures are cached across the
    bucket self-join (see jaccard_pairs on why)."""
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes, max_df)
    if persist:
        from pyspark import StorageLevel

        # Both sides of the bucket self-join derive from sig; without a
        # cache the whole shingle+minhash pipeline runs twice.
        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    buckets = _sig_band_buckets(sig, num_hashes, bands)
    a = buckets.alias("a")
    b_ = buckets.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """SimHash fingerprint per document: (id, simhash bigint).

    Token hash bits are md5-derived (portable); bit j of the fingerprint
    is the sign of Σ_tokens (±1). Implemented as explode(tokens) ×
    explode(bit index) → two-level aggregate — all JVM-side."""
    from ..session import spread_for_compute

    tokens = (
        spread_for_compute(df, heavy=True)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
    )
    # 32-bit token hash from md5 (fits comfortably in bigint arithmetic).
    hashed = tokens.withColumn(
        "th",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint"),
    )
    # Bit extraction via floor(h / 2^j) % 2 instead of shift-by-column:
    # exact in double up to 2^52 (h is 32-bit) and — unlike engine-native
    # casts — identical across Spark (truncating cast) and DuckDB
    # (rounding cast), so an oracle can replay the fingerprints.
    bit = hashed.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        F.col("th"),
    ).withColumn(
        "contrib",
        F.when(
            F.floor(F.col("th") / F.pow(F.lit(2.0), F.col("j"))).cast("bigint") % 2 == 1,
            1,
        ).otherwise(-1),
    )
    bitsum = bit.groupBy("id", "j").agg(F.sum("contrib").alias("s"))
    return bitsum.groupBy("id").agg(
        F.sum(
            F.when(
                F.col("s") > 0, F.pow(F.lit(2.0), F.col("j")).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    chunks: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation blocks on bit-chunks; with the default
    ``chunks = max_hamming + 1`` the pigeonhole principle makes the
    blocking exact (two hashes within distance d share at least one of
    d+1 chunks untouched). Passing fewer chunks trades recall for fewer
    candidates — the join key stays (chunk index, chunk value), never
    all-pairs."""
    if chunks is None:
        chunks = max_hamming + 1
    chunk_bits = bits // chunks
    sh = simhash(df, id_col, text_col, bits)
    mask = (1 << chunk_bits) - 1
    chunk_cols = [
        F.struct(
            F.lit(c).alias("ci"),
            F.shiftright(F.col("simhash"), c * chunk_bits)
            .bitwiseAND(F.lit(mask))
            .alias("cv"),
        )
        for c in range(chunks)
    ]
    blocked = sh.select(
        "id", "simhash", F.explode(F.array(*chunk_cols)).alias("ch")
    ).select("id", "simhash", F.col("ch.ci").alias("ci"), F.col("ch.cv").alias("cv"))
    a = blocked.alias("a")
    b = blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    exact: bool = False,
    planes: int = 8,
    tables: int = 12,
    seed: int = 42,
    persist: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity ≥ threshold:
    (id_a, id_b, cosine) with id_a < id_b.

    Default path is multi-table random-hyperplane LSH: each vector gets
    one bucket per hash table (single Arrow-batch matmul for all
    tables), candidates are pairs sharing a (table, bucket) key, and the
    exact cosine kernel re-scores only candidates. Shuffle key =
    (table, bucket), so pair work scales with Σ bucket² per table —
    never n². Miss probability per qualifying pair is
    (1 − a^planes)^tables with a = 1 − θ/π; the 8×12 default puts it
    ~1e-3 at cosine 0.95 and ~1e-10 at 0.99 (tests pin LSH ≡ brute
    force on the fixtures). Random (cos≈0) pairs collide in ≥1 table
    with prob ≈ 1−(1−2^-planes)^tables ≈ 4.6% — the pruning factor.

    LSH candidate pruning only exists in the high-similarity regime:
    below threshold ~0.7 the per-plane agreement probability approaches
    1/2 and recall collapses (any parameter choice restoring it
    generates ≥ all-pairs candidates). For low-threshold *pair
    enumeration* — whose output is itself Ω(n²) — pass ``exact=True``:
    brute-force all-pairs (id_a < id_b range join) with the same
    kernel, the correctness baseline for small frames."""
    from .veckernel import hyperplane_buckets, pair_cosine

    from ..session import spread_for_compute

    side = spread_for_compute(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        heavy=True,
    )

    def score(pairs: DataFrame) -> DataFrame:
        return (
            pairs.withColumn("cosine", pair_cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        )

    if exact:
        a = side.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = side.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        return score(a.join(b, F.col("id_a") < F.col("id_b")))

    # Re-score strategy probe. The join formulation Arrow-transfers BOTH
    # full vectors per candidate pair into the cosine kernel — hundreds
    # of MB for ~10^6 candidates, the dominant cost. When the corpus is
    # small enough to hold per-task (the same regime where the vector
    # joins would broadcast anyway), ship the normalized corpus matrix
    # inside a mapInPandas closure instead and send only the ID pairs
    # through Arrow: one einsum per batch, no vector shuffle at all.
    # Above the cutoff fall back to the shuffle-join + pair kernel,
    # which scales without a driver-side matrix. The cutoff is derived
    # from actual bytes (rows × dim × 8), not a fixed row count — 200k
    # rows of 1024-dim vectors would be ~1.6 GB on the driver. Dim is
    # probed with a single-row job; the collect itself is a CollectLimit
    # that stops after max_rows+1 rows, never a corpus scan.
    head = side.select(F.size("v").alias("d")).first()
    dim = head["d"] if head is not None and head["d"] else 0
    max_rows = (
        min(NEARDUP_ROW_CAP, NEARDUP_BYTES_BUDGET // (dim * 8))
        if dim > 0
        else 0
    )
    side_pdf = side.limit(max_rows + 1).toPandas() if max_rows else None
    small = side_pdf is not None and len(side_pdf) <= max_rows

    if small:
        # The probe already holds the entire (≤100 MB by construction)
        # corpus, so run the identical LSH recipe — same seeded
        # hyperplane stack as veckernel.hyperplane_buckets, same
        # (table, bucket) candidate rule, same float64 cosine — in one
        # driver-side numpy pass and skip four Spark jobs (bucket UDF
        # on both join sides, candidate persist/count, Arrow re-score).
        # This is the broadcast regime: even the distributed plan would
        # ship this matrix whole into every task closure. Per-bucket
        # Gram matrices are strip-blocked so memory stays bounded even
        # for degenerate all-identical-vector buckets (the same Σ
        # bucket² work the distributed self-join would do).
        import numpy as np
        import pandas as pd

        ids = side_pdf["id"].to_numpy()
        M = np.vstack(side_pdf["v"].to_numpy()).astype(np.float64)
        order = np.argsort(ids, kind="stable")
        ids, M = ids[order], M[order]
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0] = np.nan
        Mn = M / norms
        rng = np.random.RandomState(seed)
        H = rng.standard_normal((tables * planes, M.shape[1]))
        powers = (2 ** np.arange(planes)).astype(np.int64)
        bits = ((M @ H.T) >= 0).reshape(len(M), tables, planes)
        tb = (bits @ powers).astype(np.int64)  # (rows, tables)
        _BLOCK = 4096
        found: dict[tuple, float] = {}
        for t in range(tables):
            buckets_t: dict[int, list[int]] = {}
            for pos, bkt in enumerate(tb[:, t]):
                buckets_t.setdefault(int(bkt), []).append(pos)
            for members in buckets_t.values():
                m = len(members)
                if m < 2:
                    continue
                idx = np.asarray(members)  # ascending id order (sorted)
                for i0 in range(0, m, _BLOCK):
                    ia = idx[i0 : i0 + _BLOCK]
                    for j0 in range(i0, m, _BLOCK):
                        jb = idx[j0 : j0 + _BLOCK]
                        with np.errstate(invalid="ignore"):
                            S = Mn[ia] @ Mn[jb].T
                        mask = (S >= threshold) & (
                            ids[ia][:, None] < ids[jb][None, :]
                        )
                        for pi, pj in zip(*np.nonzero(mask)):
                            key = (ids[ia[pi]], ids[jb[pj]])
                            if key not in found:
                                found[key] = float(S[pi, pj])
        id_t = dict(side.dtypes)["id"]
        schema = f"id_a {id_t}, id_b {id_t}, cosine double"
        spark = df.sparkSession
        if not found:
            return spark.createDataFrame([], schema)
        pairs = sorted(found.items())
        out_pdf = pd.DataFrame(
            {
                "id_a": [k[0] for k, _ in pairs],
                "id_b": [k[1] for k, _ in pairs],
                "cosine": [round(c, 6) for _, c in pairs],
            }
        )
        return spark.createDataFrame(out_pdf, schema=schema)

    buckets = side.select(
        "id",
        F.posexplode(
            hyperplane_buckets(F.col("v"), tables, planes, seed)
        ).alias("t", "b"),
    )
    if persist:
        from pyspark import StorageLevel

        # Both sides of the self-join recompute the UDF otherwise.
        buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    a = buckets.alias("a")
    b = buckets.alias("b")
    # No .distinct() here: pairs colliding in several tables are rare for
    # the pruning regime (≈2^-planes per extra table), so the full-width
    # dedup shuffle would remove almost nothing while costing the largest
    # exchange of the plan. Duplicates instead dedupe in the pre-join
    # distinct below, when only candidate ID pairs (two ints) remain.
    cand = a.join(
        b,
        (F.col("a.t") == F.col("b.t"))
        & (F.col("a.b") == F.col("b.b"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    if persist:
        from pyspark import StorageLevel

        # Materialize the candidate pairs now so no bucket cache has to
        # outlive this call; repeated calls don't accumulate cached
        # partitions. What stays cached is only the candidate ID pairs
        # (two ints per row) backing the returned lazy frame — callers
        # that are done with the result may `.unpersist()` it via the
        # frame's `_cand` attribute.
        cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
        cand.count()
        buckets.unpersist()

    va = side.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = side.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    out = score(cand.distinct().join(va, "id_a").join(vb, "id_b"))
    out._cand = cand
    return out


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Daily-ingest dedup: which NEW documents survive against an
    already-deduped corpus.  Returns one row per batch document:
    (id, keep, reason) with ``reason`` ∈ {exact_corpus, exact_batch,
    near_corpus, NULL} — NULL iff keep.  Drop rules, in precedence
    order:

      exact_corpus   normalized text hash already present in the corpus
      exact_batch    an earlier (smaller-id) batch doc has the same hash
      near_corpus    k-shingle Jaccard ≥ ``threshold`` with ANY corpus doc

    Batch-internal NEAR-dups are deliberately out of scope — run the
    batch through ``jaccard_pairs``+``apply_dedup`` separately; mixing
    the two regimes makes the keep-set order-dependent.

    Scale shape: the exact rules are hash semi-joins on md5 of the
    normalized text (the corpus side reduces to DISTINCT hashes — a
    narrow frame).  The near rule is the cross-table version of
    ``jaccard_pairs``'s posting-list join: batch shingles ⋈ corpus
    shingles on the shingle key (Σ df_batch·df_corpus pairs, bounded by
    ``max_df`` on the CORPUS side — the side whose boilerplate
    frequency is unbounded), |A∩B| from the join group-count, |A∪B|
    from per-doc shingle counts.  The batch is the small side by nature
    (one ingest window vs the whole corpus), so ``broadcast_batch``
    broadcasts the batch postings and every batch-id-sized frame by
    default — the corpus gram stream is probed map-side and never
    shuffles for the join; pass False when a single ingest window is
    itself shuffle-scale and the join reverts to keyed exchanges
    (measured ~17% faster at sf0.1; the win grows with the
    corpus:batch ratio)."""
    from pyspark import StorageLevel

    # Shared-frame persists (r13-opt, guide §2.4): before this, every
    # consumer re-derived its input pipeline from the corpus scan —
    # b_hash fed three rules (3× the batch normalize+md5 pass), bp fed
    # the join AND the batch sizes (2× the batch shingle pipeline), cp
    # fed the join AND the corpus sizes (2× the CORPUS shingle
    # pipeline, the expensive one).  All three frames are narrow
    # (id+hash / id+shingle — never the text), and Spark's CacheManager
    # dedupes identical canonical plans, so repeated calls share one
    # entry.  At 100 TB the corpus postings spill to local disk
    # (MEMORY_AND_DISK), the same trade jaccard_pairs documents.
    b_hash = batch.select(
        F.col(id_col).alias("id"),
        F.md5(normalize_text_expr(F.col(text_col))).alias("__h"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    c_hash = corpus.select(
        F.md5(normalize_text_expr(F.col(text_col))).alias("__h")
    ).distinct()
    exact_corpus = b_hash.join(c_hash, "__h", "left_semi").select("id")
    batch_winners = b_hash.groupBy("__h").agg(F.min("id").alias("__w"))
    exact_batch = (
        b_hash.join(batch_winners, "__h")
        .filter(F.col("id") != F.col("__w"))
        .select("id")
    )

    maybe_b = F.broadcast if broadcast_batch else (lambda df: df)
    bp = shingle_tokens(batch, id_col, text_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cp = _df_capped(
        shingle_tokens(corpus, id_col, text_col, k), max_df
    ).persist(StorageLevel.MEMORY_AND_DISK)
    b_sizes = bp.groupBy("id").agg(F.count(F.lit(1)).alias("__nb"))
    c_sizes = cp.groupBy("id").agg(F.count(F.lit(1)).alias("__nc"))
    inter = (
        maybe_b(bp.select(F.col("id").alias("__bid"), "shingle"))
        .join(cp.select(F.col("id").alias("__cid"), "shingle"), "shingle")
        .groupBy("__bid", "__cid")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    near_corpus = (
        inter.join(
            maybe_b(b_sizes.select(F.col("id").alias("__bid"), "__nb")),
            "__bid",
        )
        .join(c_sizes.select(F.col("id").alias("__cid"), "__nc"), "__cid")
        .filter(
            F.col("__i")
            / (F.col("__nb") + F.col("__nc") - F.col("__i"))
            >= threshold
        )
        .select(F.col("__bid").alias("id"))
        .distinct()
    )

    flag = lambda ids, name: maybe_b(  # noqa: E731
        ids.select("id", F.lit(True).alias(name)).distinct()
    )
    out = (
        batch.select(F.col(id_col).alias("id"))
        .join(flag(exact_corpus, "__ec"), "id", "left")
        .join(flag(exact_batch, "__eb"), "id", "left")
        .join(flag(near_corpus, "__nc"), "id", "left")
        .select(
            "id",
            (
                F.col("__ec").isNull()
                & F.col("__eb").isNull()
                & F.col("__nc").isNull()
            ).alias("keep"),
            F.when(F.col("__ec"), F.lit("exact_corpus"))
            .when(F.col("__eb"), F.lit("exact_batch"))
            .when(F.col("__nc"), F.lit("near_corpus"))
            .alias("reason"),
        )
        .orderBy("id")
    )
    # Release handles for the shared-frame persists — cp is CORPUS-scale
    # (per-shingle rows), so a long-lived ingest session must be able to
    # drop it between windows instead of accumulating cache blocks until
    # session stop (r13 VERDICT #4 / ADVICE):
    #   for f in result._cached_frames: f.unpersist()
    out._cached_frames = (b_hash, bp, cp)
    return out


def signature_records(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    max_df: int | None = None,
) -> DataFrame:
    """The narrow per-document dedup record an incremental ingest
    pipeline PERSISTS so steady-state dedup never re-reads corpus text:
    (id, h, sig) — ``h`` = md5 of the normalized text (the exact-dup
    key), ``sig`` = MinHash signature (the near-dup key; NULL for docs
    with fewer than ``k`` words, which have no shingles and therefore
    no near-dup surface).

    At 100 TB this is the whole point: a 1B-doc corpus reduces to a
    ~(16 + 8·num_hashes)-byte row per document — a table two orders of
    magnitude narrower than the text — and every future ingest batch
    joins against THIS, not the corpus."""
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes, max_df)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.md5(normalize_text_expr(F.col(text_col))).alias("h"),
        )
        .join(sig, "id", "left")
    )


def incremental_sig_dedup(
    sig_store: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_df: int | None = None,
    broadcast_batch: bool = True,
) -> DataFrame:
    """:func:`incremental_dedup` against a persisted SIGNATURE store
    instead of the corpus text: classify every batch document as
    (id, keep, reason), reason ∈ {exact_corpus, exact_batch,
    near_corpus, NULL} — same contract, but the corpus side is the
    narrow (id, h, sig) frame :func:`signature_records` maintains, so
    the per-batch cost is batch-sized text work plus scans of a table
    ~100× narrower than the corpus. This is the steady-state ingest
    regime at 100 TB; the trade is that ``near_corpus`` is the MinHash
    ESTIMATE (matching signature positions / num_hashes ≥ threshold
    over LSH band-collision candidates) rather than exact posting-list
    Jaccard — error shrinks as 1/√num_hashes and is measured on-corpus
    by :func:`minhash_estimate_report`.

    Plan shape: batch records broadcast (an ingest window is small by
    nature); exact rule = one hash join against the store's ``h``
    column; near rule = band-bucket join with the signatures RIDING the
    bucket explode, so the estimate is computed in the same join —
    exactly one scan of the store per rule and zero corpus-text reads.
    Pass ``broadcast_batch=False`` if a single window is itself
    shuffle-scale."""
    from pyspark import StorageLevel

    # The batch records feed THREE rules (store-hash join, batch-winner
    # rule, band explode) — persist the narrow batch-sized frame so the
    # batch text pipeline runs once per call, not three times
    # (r13-opt, guide §2.4).  An ingest window is small by nature, so
    # the cache cost is bounded at any corpus scale.
    recs = signature_records(
        batch, id_col, text_col, k, num_hashes, max_df
    ).persist(StorageLevel.MEMORY_AND_DISK)
    maybe_b = F.broadcast if broadcast_batch else (lambda d: d)

    exact_corpus = (
        maybe_b(recs.select("id", "h"))
        .join(sig_store.select("h"), "h")
        .select("id")
        .distinct()
    )
    winners = recs.groupBy("h").agg(F.min("id").alias("__w"))
    exact_batch = (
        recs.join(winners, "h")
        .filter(F.col("id") != F.col("__w"))
        .select("id")
    )

    bb = _sig_band_buckets(
        recs.filter(F.col("sig").isNotNull()),
        num_hashes,
        bands,
        carry=("sig",),
    ).select(
        F.col("id").alias("__bid"),
        F.col("sig").alias("__bsig"),
        "band",
        "bucket",
    )
    sb = _sig_band_buckets(
        sig_store.filter(F.col("sig").isNotNull()),
        num_hashes,
        bands,
        carry=("sig",),
    ).select(
        F.col("id").alias("__cid"),
        F.col("sig").alias("__csig"),
        "band",
        "bucket",
    )
    # static codegen'd signature agreement — no interpreted HOF
    est = sum(
        (F.col("__bsig")[i] == F.col("__csig")[i]).cast("int")
        for i in range(num_hashes)
    ) / F.lit(float(num_hashes))
    near_corpus = (
        maybe_b(bb)
        .join(sb, ["band", "bucket"])
        .filter(est >= threshold)
        .select(F.col("__bid").alias("id"))
        .distinct()
    )

    flag = lambda ids, name: maybe_b(  # noqa: E731
        ids.select("id", F.lit(True).alias(name)).distinct()
    )
    out = (
        batch.select(F.col(id_col).alias("id"))
        .join(flag(exact_corpus, "__ec"), "id", "left")
        .join(flag(exact_batch, "__eb"), "id", "left")
        .join(flag(near_corpus, "__nc"), "id", "left")
        .select(
            "id",
            (
                F.col("__ec").isNull()
                & F.col("__eb").isNull()
                & F.col("__nc").isNull()
            ).alias("keep"),
            F.when(F.col("__ec"), F.lit("exact_corpus"))
            .when(F.col("__eb"), F.lit("exact_batch"))
            .when(F.col("__nc"), F.lit("near_corpus"))
            .alias("reason"),
        )
        .orderBy("id")
    )
    # Release handle for the batch-records persist (bounded — one ingest
    # window — but a long-lived session still wants the lifecycle):
    #   for f in result._cached_frames: f.unpersist()
    out._cached_frames = (recs,)
    return out


def minhash_estimate_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    max_df: int | None = None,
) -> DataFrame:
    """Calibration of the MinHash Jaccard ESTIMATE against the exact
    value, over the LSH candidate pairs: (id_a, id_b, est_jaccard,
    exact_jaccard, abs_err), ordered.  The companion to ann_recall —
    run it before trusting a signature length: est error shrinks as
    1/√num_hashes, and this report measures it on YOUR corpus instead
    of assuming the bound.

    est = (matching signature positions) / num_hashes — a static sum of
    ``num_hashes`` codegen'd comparisons, no interpreted HOF.  exact
    comes from the posting-list join (``jaccard_pairs`` at threshold 0)
    LEFT-joined so band-collision false positives (candidates sharing
    no shingle) report exact 0 instead of dropping out.  Everything is
    md5-derived and deterministic, so the whole report replays in the
    DuckDB oracle."""
    from pyspark import StorageLevel

    # ONE shared postings frame and ONE shared signature frame feed all
    # three sub-reports (LSH candidates, signature estimate, exact
    # Jaccard).  Before r13-opt each sub-report re-ran the whole
    # shingle (and minhash) pipeline from the corpus scan — four
    # full text pipelines per execution, two of them behind a plan
    # too wide for whole-stage codegen (Janino compile failure observed
    # at sf0.001, falling back to interpreted eval).  Guide §2.4:
    # share the exchange/scan, don't repeat it.
    postings = _df_capped(
        shingle_tokens(df, id_col, text_col, k), max_df
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sig = _sig_from_postings(postings, num_hashes).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    buckets = _sig_band_buckets(sig, num_hashes, bands)
    a_ = buckets.alias("a")
    b_ = buckets.alias("b")
    cands = (
        a_.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("__sa"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("__sb"))
    matches = None
    for i in range(num_hashes):
        term = F.when(
            F.col("__sa")[i] == F.col("__sb")[i], F.lit(1)
        ).otherwise(F.lit(0))
        matches = term if matches is None else matches + term
    est = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (matches.cast("double") / F.lit(num_hashes)).alias("__est"),
        )
    )
    exact = _jaccard_from_postings(postings, threshold=0.0).select(
        "id_a", "id_b", F.col("jaccard").alias("__ex")
    )
    out = (
        est.join(exact, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            F.round("__est", 6).alias("est_jaccard"),
            F.round(F.coalesce(F.col("__ex"), F.lit(0.0)), 6).alias(
                "exact_jaccard"
            ),
            F.round(
                F.abs(
                    F.col("__est") - F.coalesce(F.col("__ex"), F.lit(0.0))
                ),
                6,
            ).alias("abs_err"),
        )
        .orderBy("id_a", "id_b")
    )
    # Release handles — postings is CORPUS-scale (per-shingle rows):
    #   for f in result._cached_frames: f.unpersist()
    out._cached_frames = (postings, sig)
    return out


def lsh_parameter_plan_sql(
    n_hashes: int = 64,
    thresholds_micro: tuple[int, ...] = (
        300000, 500000, 700000, 800000, 900000,
    ),
    int_div: str = "DIV",
) -> str:
    """SQL for :func:`lsh_parameter_plan`, parameterized on the
    integer-division spelling (Spark ``DIV`` / DuckDB ``//``) so the
    oracle is the IDENTICAL computation on both engines."""
    if n_hashes < 2 or n_hashes & (n_hashes - 1):
        raise ValueError("lsh_parameter_plan: n_hashes must be a power of 2")
    for t in thresholds_micro:
        if not (0 < t < 1_000_000):
            raise ValueError("thresholds_micro must be in (0, 1e6)")

    def sq(e: str) -> str:
        return f"((({e}) * ({e}) + 500000) {int_div} 1000000)"

    vals = ", ".join(f"({t})" for t in thresholds_micro)
    selects = []
    b = 1
    while b <= n_hashes:
        r = n_hashes // b
        s = "CAST(t_micro AS BIGINT)"
        k = r.bit_length() - 1  # r = 2^k
        for _ in range(k):
            s = sq(s)
        u = f"(1000000 - {s})"
        m = b.bit_length() - 1  # b = 2^m
        for _ in range(m):
            u = sq(u)
        selects.append(
            f"SELECT {n_hashes} AS n_hashes, {b} AS bands, "
            f"{r} AS rows_per_band, CAST(t_micro AS BIGINT) AS t_micro, "
            f"CAST(1000000 - {u} AS BIGINT) AS p_collide_micro "
            f"FROM (VALUES {vals}) AS __t(t_micro)"
        )
        b *= 2
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ") ORDER BY bands, t_micro"
    )


def lsh_parameter_plan(
    spark,
    n_hashes: int = 64,
    thresholds_micro: tuple[int, ...] = (
        300000, 500000, 700000, 800000, 900000,
    ),
) -> DataFrame:
    """MinHash-LSH banding calibration table: for every power-of-two
    split of ``n_hashes`` into (bands b, rows-per-band r) and every
    candidate Jaccard threshold, the candidate-pair collision
    probability ``p = 1 − (1 − s^r)^b`` — the planning step that picks
    (b, r) BEFORE running ``minhash_signatures``/
    ``lsh_candidate_pairs`` over a corpus (companion to the post-hoc
    ``minhash_estimate_report``). A good split puts p ≈ 1 above the
    target threshold and ≈ 0 below it.

    Determinism: computed in 1e-6 FIXED-POINT BIGINT arithmetic —
    every exponent is a power of two, so ``s^r`` and ``(1−s^r)^b``
    are explicit squaring chains with half-up rescaling at each step
    (``(x·x + 5e5) DIV 1e6``). Pure integer ops ⇒ bit-identical on
    any engine, immune to libm pow() last-ulp differences (the
    quantization error vs the real-valued curve is < 1e-4 — harmless
    for a planning table). No corpus access; O(log₂ n_hashes ·
    #splits · #thresholds) constant work."""
    return spark.sql(
        lsh_parameter_plan_sql(n_hashes, thresholds_micro, int_div="DIV")
    )


def dedup_flow_matrix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Directional duplicate-flow report between corpus groups (r13):
    for every near-duplicate candidate pair (:func:`jaccard_pairs`,
    ``jaccard >= threshold``) the KEPT side is the min-id document —
    exactly :func:`apply_dedup`'s keep rule — so each pair contributes
    one ``(group_kept, group_dropped)`` flow.  The release-report view
    of WHERE dedup losses land: a matrix heavy on one row means that
    source is mostly re-collecting the others (crawl-B-re-crawls-A),
    heavy on the diagonal means within-source duplication.

    Returns (group_kept, group_dropped, n_pairs, flow_micro) ordered;
    ``flow_micro`` is the flow's share of all duplicate pairs as a
    half-up BIGINT micro-division (engine-replayable, the
    threshold-sweep rule).

    Spark shape: the banded/blocked candidate generation does all the
    heavy lifting (never all-pairs); the pair frame then takes two
    KEYED equi-joins against the (id → group) projection — never a
    broadcast of the corpus — and one hash-agg bounded by |groups|²;
    the share window runs over that bounded aggregate.  No reference
    counterpart; training-pipeline §2C dedup family."""
    pairs = jaccard_pairs(
        df, id_col, text_col, k, threshold=threshold, max_df=max_df
    )
    src = df.select(
        F.col(id_col).alias("__fid"), F.col(group_col).alias("__fg")
    )
    flows = (
        pairs.join(src, pairs.id_a == src.__fid)
        .select("id_b", F.col("__fg").alias("group_kept"))
        .join(src, F.col("id_b") == src.__fid)
        .select("group_kept", F.col("__fg").alias("group_dropped"))
        .groupBy("group_kept", "group_dropped")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    return flows.select(
        "group_kept",
        "group_dropped",
        "n_pairs",
        F.expr(
            "(n_pairs * 2000000 + sum(n_pairs) OVER ()) DIV "
            "(2 * sum(n_pairs) OVER ())"
        ).alias("flow_micro"),
    ).orderBy("group_kept", "group_dropped")


def split_leakage_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    fractions: dict[str, float],
    k: int = 3,
    threshold: float = 0.5,
    seed: str = "split",
    max_df: int | None = None,
) -> DataFrame:
    """Cross-split near-duplicate contamination audit (r13): after the
    deterministic hash split (:func:`sampling.hash_split`), count the
    near-duplicate pairs (:func:`jaccard_pairs`, ``jaccard ≥
    threshold``) that STRADDLE splits — the test-set contamination a
    dedup-before-split pipeline exists to prevent: a train/test
    near-dup pair means the eval set leaks into training however clean
    the split hash is.  Returns (split_a, split_b, n_pairs,
    leak_docs), ordered — the unordered split pair (name-min,
    name-max), straddling-pair count, and the distinct higher-id docs
    involved (the ones ``apply_dedup``'s min-id rule would have
    removed); diagonal rows give the within-split base rate.

    Spark shape: the banded posting-list join generates candidates
    (never all-pairs); the pair frame takes two KEYED equi-joins to
    the (id → split) projection — never a corpus broadcast — and one
    |splits|²-bounded agg (count-distinct is pairs-bounded).  100 TB:
    identical to dedup_flow_matrix's audited shape with the split
    label in place of the source group."""
    pairs = jaccard_pairs(
        df, id_col, text_col, k, threshold=threshold, max_df=max_df
    )
    from .sampling import hash_split

    s = hash_split(
        df.select(F.col(id_col)), id_col, fractions, seed=seed
    ).select(F.col(id_col).alias("__sid"), F.col("split").alias("__sp"))
    j = (
        pairs.join(s, pairs.id_a == s.__sid)
        .select("id_a", "id_b", F.col("__sp").alias("sp_a"))
        .join(s, F.col("id_b") == s.__sid)
        .select("id_b", "sp_a", F.col("__sp").alias("sp_b"))
    )
    return (
        j.select(
            F.least("sp_a", "sp_b").alias("split_a"),
            F.greatest("sp_a", "sp_b").alias("split_b"),
            "id_b",
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("id_b").alias("leak_docs"),
        )
        .orderBy("split_a", "split_b")
    )


def dedup_quality_shift(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Dedup survivor-bias audit (r13): per group, corpus quality
    BEFORE vs AFTER near-dedup under the pair-local min-id rule —
    does removing duplicates systematically remove LOW-quality docs
    (dedup doubles as a quality filter: spam is usually duplicated)
    or HIGH-quality ones (canonical reference texts get re-crawled
    most)?  The answer decides whether a pipeline can tune dedup and
    the quality cutoff independently.  Returns (group, n_before,
    n_after, mean_q_before_micro, mean_q_after_micro, shift_micro),
    ordered — means are half-up BIGINT micro-divisions of the
    engine-proof quality micro-scores; ``shift_micro`` may be
    negative (dedup lowered mean quality).

    Spark shape: one quality pass; the banded pair join's distinct
    larger-ids form the drop set (pair-bounded); ONE left join marks
    survivors and ONE hash-agg computes both sides as conditional
    sums — never two corpus passes.  100 TB: drop set broadcasts when
    small, keyed join otherwise; everything after is
    |groups|-bounded."""
    from .text import quality_score

    pairs = jaccard_pairs(
        df, id_col, text_col, k, threshold=threshold, max_df=max_df
    )
    dropped = pairs.select(F.col("id_b").alias("__did")).distinct()
    q = quality_score(
        df, id_col, text_col, keep_cols=(group_col,), micro_units=True
    ).select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("__qid"),
        "quality_micro",
    )
    marked = q.join(
        dropped, q.__qid == dropped.__did, "left"
    ).select(
        "g",
        "quality_micro",
        F.col("__did").isNull().alias("__kept"),
    )
    wide = marked.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum(F.when(F.col("__kept"), 1).otherwise(0))
        .cast("long")
        .alias("n_after"),
        F.sum("quality_micro").alias("__sq_before"),
        F.sum(F.when(F.col("__kept"), F.col("quality_micro")).otherwise(0))
        .cast("long")
        .alias("__sq_after"),
    )
    return (
        wide.select(
            F.col("g").alias(group_col),
            "n_before",
            "n_after",
            F.expr(
                "(2L * __sq_before + n_before) DIV (2L * n_before)"
            ).alias("mean_q_before_micro"),
            F.expr(
                "CASE WHEN n_after = 0 THEN NULL ELSE "
                "(2L * __sq_after + n_after) DIV (2L * n_after) END"
            ).alias("mean_q_after_micro"),
        )
        .select(
            group_col,
            "n_before",
            "n_after",
            "mean_q_before_micro",
            "mean_q_after_micro",
            (
                F.col("mean_q_after_micro") - F.col("mean_q_before_micro")
            ).alias("shift_micro"),
        )
        .orderBy(group_col)
    )


def jaccard_threshold_curve(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    thresholds_pct: tuple[int, ...] = (50, 60, 70, 80, 90),
    max_df: int | None = None,
) -> DataFrame:
    """Empirical dedup-threshold survival curve (r13): for every
    Jaccard cutoff in the grid, how many near-duplicate pairs the
    cutoff flags and how many documents the PAIR-LOCAL min-id rule
    drops (every doc that is the larger id of some flagged pair — an
    ANSI-replayable lower bound on :func:`graph.apply_dedup`'s
    connected-component drop set, which also removes chain-linked
    docs that are never a pair's larger id).  The EMPIRICAL companion to
    :func:`lsh_parameter_plan`, which answers the same question
    analytically from the banding S-curve: the planner picks
    bands×rows for a target threshold, this measures what each
    threshold actually does to THIS corpus.  Returns
    (threshold_pct, dup_pairs, docs_dropped, n_docs, drop_micro),
    ordered — BIGINT end to end: the threshold compare is the
    cross-multiplied integer predicate ``100·inter ≥ t·union`` (exact
    rational comparison, no double jaccard anywhere in the contract)
    and ``drop_micro`` is the half-up micro-division.

    Spark shape: the posting-list self-join produces integer
    (inter, union) pair stats ONCE, pre-filtered at the grid minimum;
    the grid then folds into conditional sums over that single
    exchange (never pairs × grid) in ONE pass: the loser-keyed agg
    computes per doc both the pair count (``sum(flag)``) and the
    dropped bit (``max(flag)``) per cutoff — every pair has exactly
    one loser, so the global re-aggregate of the sums IS the flagged
    pair count, and of the maxes the drop count; the pair join is
    never evaluated twice.  The wide single row unstacks with
    ``stack`` and crosses the 1-row corpus count.  100 TB: everything
    after the pair join is |pairs|-bounded, then |docs|-bounded, then
    one row; the tiny frames broadcast."""
    grid = [int(t) for t in thresholds_pct]
    if not grid or any(t <= 0 or t > 100 for t in grid):
        raise ValueError(
            "jaccard_threshold_curve: thresholds_pct must be in (0, 100]"
        )
    tmin = min(grid)
    postings = _df_capped(shingle_tokens(df, id_col, text_col, k), max_df)
    from pyspark import StorageLevel

    postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = postings.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("ca"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("cb"))
    st = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter"),
            (F.col("ca") + F.col("cb") - F.col("inter"))
            .cast("long")
            .alias("uni"),
        )
        .filter(F.lit(100) * F.col("inter") >= F.lit(tmin) * F.col("uni"))
    )
    flag = lambda t: F.when(  # noqa: E731 — grid-folded predicate
        F.lit(100) * F.col("inter") >= F.lit(t) * F.col("uni"), 1
    ).otherwise(0)
    # one pass: per loser doc, the flagged-pair count AND the dropped
    # bit per cutoff; the global re-aggregate yields both curve
    # columns without evaluating the pair join twice
    wide = (
        st.groupBy(F.col("id_b").alias("doc"))
        .agg(
            *[F.sum(flag(t)).alias(f"__pp{i}") for i, t in enumerate(grid)],
            *[F.max(flag(t)).alias(f"__dd{i}") for i, t in enumerate(grid)],
        )
        .agg(
            *[F.sum(f"__pp{i}").alias(f"__p{i}") for i in range(len(grid))],
            *[F.sum(f"__dd{i}").alias(f"__s{i}") for i in range(len(grid))],
        )
    )
    total = df.select(F.count(F.lit(1)).alias("n_docs"))
    stack = ", ".join(
        f"CAST({t} AS BIGINT), coalesce(CAST(__p{i} AS BIGINT), 0L), "
        f"coalesce(CAST(__s{i} AS BIGINT), 0L)"
        for i, t in enumerate(grid)
    )
    return (
        wide.crossJoin(total)
        .select(
            F.expr(
                f"stack({len(grid)}, {stack}) "
                "AS (threshold_pct, dup_pairs, docs_dropped)"
            ),
            "n_docs",
        )
        .select(
            "threshold_pct",
            "dup_pairs",
            "docs_dropped",
            "n_docs",
            F.expr(
                "(2L * 1000000L * docs_dropped + n_docs) DIV (2L * n_docs)"
            ).alias("drop_micro"),
        )
        .orderBy("threshold_pct")
    )


def method_agreement_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    bits: int = 32,
    max_hamming: int = 3,
    jaccard_pct: int = 50,
    max_df: int | None = None,
) -> DataFrame:
    """Blocking-method agreement audit (r13): MinHash-LSH vs SimHash
    candidate generation over the same corpus, cross-checked against
    the exact n-gram Jaccard — which dup families does each method
    find that the other misses, and how real are they?  The
    cross-METHOD companion to :func:`minhash_estimate_report` (which
    calibrates one method against ground truth): per agreement cell
    (``both`` / ``minhash_only`` / ``simhash_only``) the pair count,
    the count whose exact Jaccard clears ``jaccard_pct`` (the integer
    cross-multiplied predicate ``100·inter ≥ t·union`` — no double
    jaccard), the mean exact Jaccard and the true-pair share, both as
    half-up BIGINT micro.  A large ``simhash_only`` cell with high
    mean Jaccard means the LSH banding is tuned too tight (see
    :func:`lsh_parameter_plan`); a large low-Jaccard ``both`` cell
    means the shingle width k is too small for the corpus.

    Spark shape: both candidate generators keep their native blocked
    join shapes (band/bucket equi-join; chunk pigeonhole equi-join —
    never all-pairs); the exact stats come from ONE posting-list
    self-join LEFT-joined to the candidate union, so a band-collision
    pair sharing no shingle reports Jaccard 0 instead of dropping
    out.  Everything md5-derived and integer-arithmetic, so the whole
    report replays in a DuckDB oracle."""
    mh = (
        lsh_candidate_pairs(
            df, id_col, text_col, k, num_hashes, bands, max_df
        )
        .select("id_a", "id_b")
        .withColumn("__m", F.lit(1))
    )
    sh = (
        simhash_near_dups(df, id_col, text_col, bits, max_hamming)
        .select("id_a", "id_b")
        .withColumn("__s", F.lit(1))
    )
    cand = mh.join(sh, ["id_a", "id_b"], "full_outer")

    postings = _df_capped(shingle_tokens(df, id_col, text_col, k), max_df)
    from pyspark import StorageLevel

    postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = postings.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sa = sizes.select(
        F.col("id").alias("id_a"), F.col("n_shingles").alias("__ca")
    )
    sb = sizes.select(
        F.col("id").alias("id_b"), F.col("n_shingles").alias("__cb")
    )
    stats = (
        cand.join(inter, ["id_a", "id_b"], "left")
        .join(sa, "id_a", "left")
        .join(sb, "id_b", "left")
        .select(
            F.when(F.col("__m").isNotNull() & F.col("__s").isNotNull(), "both")
            .when(F.col("__m").isNotNull(), "minhash_only")
            .otherwise("simhash_only")
            .alias("method"),
            F.coalesce(F.col("__inter"), F.lit(0)).cast("long").alias("i"),
            (
                F.coalesce(F.col("__ca"), F.lit(0))
                + F.coalesce(F.col("__cb"), F.lit(0))
                - F.coalesce(F.col("__inter"), F.lit(0))
            ).cast("long").alias("u"),
        )
        .select(
            "method",
            F.expr(
                f"CASE WHEN u > 0 AND 100 * i >= {int(jaccard_pct)} * u "
                "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            ).alias("istrue"),
            F.expr(
                "(2 * 1000000 * i + greatest(u, CAST(1 AS BIGINT))) "
                "DIV (2 * greatest(u, CAST(1 AS BIGINT)))"
            ).alias("jmicro"),
        )
    )
    agg = stats.groupBy("method").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("istrue").alias("n_true_pairs"),
        F.sum("jmicro").alias("__sj"),
    )
    out = agg.select(
        "method",
        "n_pairs",
        "n_true_pairs",
        F.expr(
            "(2 * __sj + n_pairs) DIV (2 * n_pairs)"
        ).alias("mean_jaccard_micro"),
        F.expr(
            "(2 * 1000000 * n_true_pairs + n_pairs) DIV (2 * n_pairs)"
        ).alias("true_frac_micro"),
    ).orderBy("method")
    # corpus-scale persist release handle (r14 lifecycle convention):
    #   for f in result._cached_frames: f.unpersist()
    out._cached_frames = (postings,)
    return out


def dedup_pair_exemplars(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n: int = 5,
    max_df: int | None = None,
) -> DataFrame:
    """Human-review sample of near-duplicate pairs: the ``n``
    highest- and ``n`` lowest-scoring candidate pairs by exact n-gram
    Jaccard over the posting-list candidates — the pair-level
    companion to :func:`text.quality_exemplars` (docs) and the
    eyeball check that turns :func:`jaccard_threshold_curve`'s counts
    into a defensible cutoff: look at pairs just above and just below
    before deleting anything.

    Returns (kind, rank, id_a, id_b, inter, union_, jaccard_micro),
    ordered — kind ``top`` (most similar first) / ``bottom`` (least
    similar candidate pairs), BIGINT micro scores, (score, id_a,
    id_b) tie-breaks so the sample replays in any engine.

    Spark shape: integer pair stats once from the posting self-join
    (never all-pairs); each pair emits its two (kind, signed-key)
    rows via a 2-element explode so a SINGLE row_number window over
    ONE kind-keyed exchange ranks both directions — the
    quality_exemplars pattern on the pairs frame."""
    postings = _df_capped(shingle_tokens(df, id_col, text_col, k), max_df)
    from pyspark import StorageLevel

    postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = postings.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = postings.alias("a")
    b = postings.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("ca"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("cb"))
    st = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter"),
            (F.col("ca") + F.col("cb") - F.col("inter"))
            .cast("long")
            .alias("union_"),
        )
        .withColumn(
            "jaccard_micro",
            F.expr(
                "(2 * 1000000 * inter + greatest(union_, CAST(1 AS BIGINT)))"
                " DIV (2 * greatest(union_, CAST(1 AS BIGINT)))"
            ),
        )
    )
    tagged = st.select(
        "id_a",
        "id_b",
        "inter",
        "union_",
        "jaccard_micro",
        F.explode(
            F.array(
                F.struct(
                    F.lit("top").alias("kind"),
                    (-F.col("jaccard_micro")).alias("skey"),
                ),
                F.struct(
                    F.lit("bottom").alias("kind"),
                    F.col("jaccard_micro").alias("skey"),
                ),
            )
        ).alias("t"),
    )
    from pyspark.sql.window import Window

    win = Window.partitionBy("t.kind").orderBy(
        F.col("t.skey").asc(), F.col("id_a").asc(), F.col("id_b").asc()
    )
    return (
        tagged.select(
            F.col("t.kind").alias("kind"),
            F.row_number().over(win).alias("rank"),
            "id_a",
            "id_b",
            "inter",
            "union_",
            "jaccard_micro",
        )
        .filter(F.col("rank") <= n)
        .orderBy("kind", "rank")
    )
