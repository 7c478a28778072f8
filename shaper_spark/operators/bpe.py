"""Byte-pair-encoding vocabulary learning from a corpus (Sennrich et
al. 2016) — the tokenizer-training step of a pretraining pipeline.

Scale split, the way fastBPE/sentencepiece do it: the CORPUS-sized work
is one hash-aggregate (distinct word → frequency), which Spark shuffles
on the word with map-side partials; the merge loop then runs
driver-local over that bounded frequency table (vocabulary size is
orders of magnitude below corpus size — and ``max_words`` caps it
explicitly, keeping the driver safe on adversarial corpora: dropping
rare words barely moves pair counts). Each merge is O(vocab), not
O(corpus); no per-merge cluster pass.

Determinism: ties in pair frequency break lexicographically, so the
merge list is a pure function of the word-frequency table — any engine
that reproduces the frequencies reproduces the tokenizer.

Reference parity note: no counterpart in the reference — §2C
training-pipeline extension surface.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, functions as F

__all__ = ["learn_bpe", "bpe_encode", "bpe_encode_corpus", "bpe_pair_frequencies"]

_EOW = "</w>"


def bpe_pair_frequencies(
    df: DataFrame, text_col: str, top_k: int | None = None
) -> DataFrame:
    """Corpus-wide adjacent-symbol pair frequencies for the FIRST BPE
    iteration — the distributed primitive a cluster-scale BPE trainer
    runs per merge step (here over the initial character alphabet; the
    argmax row IS the first merge ``learn_bpe`` picks when max_words
    doesn't truncate).

    Returns (left_sym, right_sym, pair_count), weighted by word
    frequency, with the end-of-word marker as the final right symbol —
    ordered by (count desc, pair asc) like the merge argmax, optionally
    truncated to ``top_k``.

    Spark shape: one word hash-agg (map-side partials) then a
    position-explode over the WORD TABLE (bounded by distinct words,
    not corpus size) and a second hash-agg over pairs — fully codegen,
    no Python, no windows. ANSI-replayable, so the oracle hash-checks
    it."""
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pos = words.select(
        "w",
        "n",
        F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"),
    )
    pairs = pos.select(
        F.substring(F.col("w"), F.col("i"), 1).alias("left_sym"),
        F.when(
            F.col("i") < F.length("w"),
            F.substring(F.col("w"), F.col("i") + 1, 1),
        )
        .otherwise(F.lit(_EOW))
        .alias("right_sym"),
        "n",
    )
    out = (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("n").alias("pair_count"))
        .orderBy(
            F.col("pair_count").desc(),
            F.col("left_sym").asc(),
            F.col("right_sym").asc(),
        )
    )
    return out.limit(top_k) if top_k else out


def learn_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    list in application order. Words are whitespace tokens with an
    end-of-word marker, per the original formulation."""
    if n_merges <= 0:
        raise ValueError("learn_bpe: n_merges must be > 0")
    # Corpus-scale reduction: distinct word -> frequency, truncated to
    # the max_words most frequent (ties by word for determinism).
    rows = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]) + (_EOW,): r["n"] for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair
        pair = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def bpe_encode_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply a learned merge list to the WHOLE corpus — the tokenize
    step that feeds token-count-driven operators (sequence packing,
    UniMax budgets, token-level dedup). Returns
    (id, n_words, n_tokens, tokens_per_word) per document.

    Spark shape: the merge list broadcasts inside the ``mapInPandas``
    closure (tokenizers are KBs; the corpus never moves for it); each
    Arrow batch encodes every DISTINCT word once through a per-batch
    memo dict — Zipf's law makes the word working set per batch tiny
    relative to the token stream, so the Python cost is per distinct
    word, not per token. No shuffle at all: tokenization is a map.

    Greedy in merge order, matching ``bpe_encode`` exactly
    (pytest-pinned); documents are never materialized as token arrays
    here — emit counts, and compose with ``chunking``/``packing`` when
    sequences are needed."""
    out_schema = f"{id_col} long, n_words long, n_tokens long"
    merges_local = list(merges)

    def batches(it):
        import pandas as pd

        memo: dict[str, int] = {}

        def n_toks(word: str) -> int:
            got = memo.get(word)
            if got is None:
                got = len(bpe_encode(word, merges_local))
                memo[word] = got
            return got

        for pdf in it:
            ids, nw, nt = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in text.split(" ") if w]
                ids.append(i)
                nw.append(len(words))
                nt.append(sum(n_toks(w) for w in words))
            yield pd.DataFrame(
                {id_col: ids, "n_words": nw, "n_tokens": nt}
            )

    from ..session import spread_for_compute

    out = spread_for_compute(df.select(id_col, text_col), heavy=True).mapInPandas(
        batches, out_schema
    )
    return out.select(
        id_col,
        "n_words",
        "n_tokens",
        F.round(
            F.col("n_tokens")
            / F.greatest(F.col("n_words").cast("double"), F.lit(1.0)),
            6,
        ).alias("tokens_per_word"),
    )


def bpe_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a learned merge list to one word (greedy, in merge order —
    the standard BPE encoder). Returns the symbol sequence including
    the end-of-word marker."""
    sym = list(word) + [_EOW]
    for pair in merges:
        merged = pair[0] + pair[1]
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                out.append(merged)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym
