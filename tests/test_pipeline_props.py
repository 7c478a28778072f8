"""Property-based tests (hypothesis) for the pipeline operators whose
semantics are easiest to get subtly wrong: greedy packing and the
interval join. Spark execution is compared against tiny pure-Python
reference implementations on randomized inputs."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from shaper_spark.operators.packing import pack_sequences
from shaper_spark.operators.rangejoin import interval_join


def _ref_pack(tokens: list[int], budget: int) -> list[int]:
    chunks, chunk, cum = [], 0, 0
    for t in tokens:
        if cum and cum + t > budget:
            chunk += 1
            cum = 0
        cum += t
        chunks.append(chunk)
    return chunks


class TestPackingProperties:
    @given(
        st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=30),
        st.integers(min_value=1, max_value=120),
    )
    @settings(max_examples=12, deadline=None)
    def test_matches_reference_greedy(self, spark, tokens, budget):
        df = spark.createDataFrame(
            [("g", i, t) for i, t in enumerate(tokens)],
            "grp string, doc long, tokens long",
        )
        got = {
            r["doc"]: r["chunk"]
            for r in pack_sequences(df, ["grp"], "doc", "tokens", budget).collect()
        }
        want = dict(enumerate(_ref_pack(tokens, budget)))
        assert got == want


def _ref_interval(points, intervals):
    return {
        (pid, iid)
        for pid, ts in points
        for iid, s, e in intervals
        if s <= ts <= e
    }


_base = dt.datetime(2024, 1, 1)
_ts = st.integers(min_value=0, max_value=14 * 86400).map(
    lambda s: _base + dt.timedelta(seconds=s)
)


class TestIntervalJoinProperties:
    @given(
        st.lists(_ts, min_size=1, max_size=15),
        st.lists(st.tuples(_ts, st.integers(min_value=0, max_value=3 * 86400)),
                 min_size=1, max_size=8),
        st.sampled_from([60, 3600, 86400]),
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_reference_join(self, spark, point_times, iv_specs, bin_s):
        points = [(i, t) for i, t in enumerate(point_times)]
        intervals = [
            (f"i{j}", s, s + dt.timedelta(seconds=d))
            for j, (s, d) in enumerate(iv_specs)
        ]
        pdf = spark.createDataFrame(points, "pid long, ts timestamp")
        idf = spark.createDataFrame(
            intervals, "iid string, s timestamp, e timestamp"
        )
        got = {
            (r["pid"], r["iid"])
            for r in interval_join(pdf, idf, "ts", "s", "e", bin_s).collect()
        }
        assert got == _ref_interval(points, intervals)

    @given(
        st.lists(
            st.tuples(_ts, st.one_of(st.none(), st.floats(0, 100)),
                      st.booleans()),  # (ts, nullable payload, duplicate?)
            min_size=1, max_size=10,
        ),
        st.lists(st.tuples(_ts, st.integers(min_value=0, max_value=3 * 86400)),
                 min_size=1, max_size=6),
        st.sampled_from([3600, 86400]),
    )
    @settings(max_examples=10, deadline=None)
    def test_left_join_row_identity_with_nulls_and_dups(
        self, spark, point_specs, iv_specs, bin_s
    ):
        """Every physical point row yields exactly its matched interval
        ids, or a single NULL row — regardless of NULL payloads or
        exact-duplicate rows (row identity, not row equality)."""
        points = []
        for i, (t, payload, dup) in enumerate(point_specs):
            points.append((i, t, payload))
            if dup:
                points.append((i, t, payload))
        intervals = [
            (f"i{j}", s, s + dt.timedelta(seconds=d))
            for j, (s, d) in enumerate(iv_specs)
        ]
        pdf = spark.createDataFrame(points, "pid long, ts timestamp, v double")
        idf = spark.createDataFrame(
            intervals, "iid string, s timestamp, e timestamp"
        )
        out = interval_join(
            pdf, idf, "ts", "s", "e", bin_s, how="left"
        ).collect()
        got: dict[int, list] = {}
        for r in out:
            got.setdefault(r["pid"], []).append(r["iid"])
        n_copies = {pid: sum(1 for p, _, _ in points if p == pid)
                    for pid, _, _ in points}
        matches = _ref_interval(
            [(pid, t) for pid, t, _ in points], intervals
        )
        for pid, _, _ in points:
            ivs = sorted(i for p, i in matches if p == pid)
            want = (ivs or [None]) * n_copies[pid]
            assert sorted(got[pid], key=lambda x: (x is None, x)) == sorted(
                want, key=lambda x: (x is None, x)
            ), f"pid={pid}"


def _ref_repetition(words: list[str]) -> tuple[float, int, float | None]:
    n = len(words)
    dup = round(1 - len(set(words)) / n, 6)
    bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    if not bigrams:
        return dup, 0, None
    top = max(bigrams.count(g) for g in set(bigrams))
    return dup, len(bigrams), round(top / len(bigrams), 6)


class TestRepetitionProperties:
    @given(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "e"]),
            min_size=1,
            max_size=25,
        )
    )
    @settings(max_examples=12, deadline=None)
    def test_matches_reference(self, spark, words):
        from shaper_spark.operators.text import repetition_stats

        df = spark.createDataFrame([(1, " ".join(words))], ["id", "text"])
        r = repetition_stats(df, "id", "text").collect()[0]
        dup, n_big, top = _ref_repetition(words)
        assert r["n_words"] == len(words)
        assert r["dup_word_frac"] == dup
        assert r["n_bigrams"] == n_big
        assert r["top_bigram_frac"] == top


class TestTfidfProperties:
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=8
            ),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_reference(self, spark, docs):
        import math

        from shaper_spark.operators.text import tfidf_top_terms

        df = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["id", "text"]
        )
        got = {
            (r["id"], r["term"]): (r["tf"], r["df"], r["tfidf"])
            for r in tfidf_top_terms(df, "id", "text", top_k=99).collect()
        }
        n_docs = len(docs)
        dfreq: dict[str, int] = {}
        for ws in docs:
            for t in set(ws):
                dfreq[t] = dfreq.get(t, 0) + 1
        for i, ws in enumerate(docs):
            for t in set(ws):
                tf = ws.count(t)
                tfidf = round(
                    tf * (math.log((n_docs + 1) / (dfreq[t] + 1)) + 1), 6
                )
                assert got[(i, t)] == (tf, dfreq[t], tfidf)


def _ref_dup_spans(texts: list[str], k: int) -> dict[int, tuple[int, int]]:
    """Pure-Python reference: per doc index → (n_grams, n_dup_grams).

    Tokenization is split-on-single-space (NOT whitespace-split): like
    Spark's ``split(text, ' ')`` and DuckDB's ``string_split``, an empty
    text yields one empty token — the operator is defined on
    single-space-separated word streams, and all three agree."""
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    grams = {
        i: [tuple(ts[j : j + k]) for j in range(len(ts) - k + 1)]
        for i, ts in toks.items()
    }
    docs_of = {}
    for i, gs in grams.items():
        for g in set(gs):
            docs_of.setdefault(g, set()).add(i)
    return {
        i: (len(gs), sum(1 for g in gs if len(docs_of[g]) > 1))
        for i, gs in grams.items()
        if gs
    }


class TestDupSpanProperties:
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["x", "y", "z"]), min_size=0, max_size=12
            ).map(" ".join),
            min_size=1,
            max_size=6,
        ),
        st.integers(min_value=1, max_value=4),
    )
    @settings(max_examples=12, deadline=None)
    def test_matches_reference(self, spark, texts, k):
        from shaper_spark.operators.dupspans import duplicated_span_stats

        df = spark.createDataFrame(list(enumerate(texts)), ["id", "text"])
        got = {
            r["id"]: (r["n_grams"], r["n_dup_grams"])
            for r in duplicated_span_stats(df, "id", "text", k=k).collect()
        }
        # reference splits on whitespace; Spark splits on the single
        # space — equal for these inputs (no doubled spaces generated)
        want = _ref_dup_spans(texts, k)
        assert got == want


class TestNormalizedDedupProperties:
    @given(
        st.lists(
            st.text(
                alphabet="aAbB !?.,09", min_size=0, max_size=15
            ),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=12, deadline=None)
    def test_winner_set_matches_reference(self, spark, texts):
        import re

        from shaper_spark.operators.dedup import dedup_exact_normalized

        def norm(t):
            t = re.sub(r"[^a-z0-9 ]", "", t.lower())
            return re.sub(r" +", " ", t).strip()

        winners = {}
        for i, t in enumerate(texts):
            key = norm(t)
            winners.setdefault(key, i)
        want = sorted(winners.values())

        df = spark.createDataFrame(list(enumerate(texts)), ["id", "text"])
        got = sorted(
            r["id"] for r in dedup_exact_normalized(df, "text", "id").collect()
        )
        assert got == want


def _ref_coverage(texts: list[str], cutoffs: list[int]):
    from collections import Counter

    counts = Counter(
        tok for t in texts for tok in t.split(" ") if tok
    )
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    out = {}
    for v in cutoffs:
        covered = sum(c for _, c in ranked[:v])
        out[v] = (len(counts), covered, total)
    return out


class TestVocabCoverageProperties:
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "dd", "ee", "fff"]),
                min_size=1,
                max_size=12,
            ).map(" ".join),
            min_size=1,
            max_size=15,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_pure_python_reference(self, spark, texts):
        from shaper_spark.operators.text import vocab_coverage_curve

        df = spark.createDataFrame(
            list(enumerate(texts)), "id long, text string"
        )
        cutoffs = (1, 2, 4, 8)
        got = {
            r["cutoff"]: (
                r["vocab_size"],
                r["covered_tokens"],
                r["total_tokens"],
            )
            for r in vocab_coverage_curve(df, "text", cutoffs).collect()
        }
        want = _ref_coverage(texts, list(cutoffs))
        assert got == want


def _ref_incremental(corpus: list[tuple[int, str]], batch: list[tuple[int, str]]):
    """Exact-rule reference (near rule needs shingles; exercised with
    k-gram-free short texts so near never fires)."""
    import hashlib
    import re

    def norm(t):
        t = re.sub(r"[^a-z0-9 ]", "", t.lower())
        return re.sub(r" +", " ", t).strip()

    ch = {hashlib.md5(norm(t).encode()).hexdigest() for _, t in corpus}
    out = {}
    seen: dict[str, int] = {}
    for i, t in sorted(batch):
        h = hashlib.md5(norm(t).encode()).hexdigest()
        if h in ch:
            out[i] = "exact_corpus"
        elif h in seen:
            out[i] = "exact_batch"
        else:
            out[i] = None
        seen.setdefault(h, i)
    return out


class TestIncrementalDedupProperties:
    @given(
        st.lists(
            st.sampled_from(["alpha", "beta gamma", "Delta!", "epsilon zeta"]),
            min_size=0,
            max_size=6,
        ),
        st.lists(
            st.sampled_from(["alpha", "beta gamma", "delta", "NEW thing"]),
            min_size=1,
            max_size=6,
        ),
    )
    @settings(max_examples=10, deadline=None)
    def test_exact_rules_match_reference(self, spark, ctexts, btexts):
        from shaper_spark.operators.dedup import incremental_dedup

        corpus = [(i, t) for i, t in enumerate(ctexts)]
        batch = [(100 + i, t) for i, t in enumerate(btexts)]
        cdf = spark.createDataFrame(
            corpus or [(0, "placeholder")], "doc_id long, text string"
        )
        if not corpus:
            cdf = cdf.limit(0)
        bdf = spark.createDataFrame(batch, "doc_id long, text string")
        # texts are < 3 words or unrelated → near_corpus cannot fire at
        # the defaults (k=3 shingles need ≥3 words AND ≥0.5 jaccard)
        got = {
            r["id"]: r["reason"]
            for r in incremental_dedup(
                cdf, bdf, "doc_id", "text"
            ).collect()
        }
        assert got == _ref_incremental(corpus, batch)


class TestCharclassProperties:
    @staticmethod
    def _ref(texts):
        import string as _string

        letters = set(_string.ascii_letters)
        digits = set("0123456789")
        ws = set(" \t\n\x0b\x0c\r")
        punct = {chr(c) for r in ((33, 48), (58, 65), (91, 97), (123, 127))
                 for c in range(*r)}
        ctrl = {chr(c) for c in list(range(1, 9)) + list(range(14, 32))
                + [127]}
        tot = {"let": 0, "dig": 0, "ws": 0, "pun": 0, "ctl": 0, "oth": 0,
               "nc": 0}
        for t in texts:
            for ch in t:
                tot["nc"] += 1
                if ch in letters:
                    tot["let"] += 1
                elif ch in digits:
                    tot["dig"] += 1
                elif ch in ws:
                    tot["ws"] += 1
                elif ch in punct:
                    tot["pun"] += 1
                elif ch in ctrl:
                    tot["ctl"] += 1
                else:
                    tot["oth"] += 1
        return tot

    @staticmethod
    def _micro(cnt, tot):
        g = max(tot, 1)
        return (2 * 1000000 * cnt + g) // (2 * g)

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    min_codepoint=1, max_codepoint=0x2FF,
                    # surrogate-free plane-0 chunk incl. control chars,
                    # NBSP, latin-1 letters
                ),
                max_size=25,
            ),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=12, deadline=None)
    def test_matches_pure_python_reference(self, spark, texts):
        from shaper_spark.operators.text import charclass_composition

        df = spark.createDataFrame(
            [(i, t, "s") for i, t in enumerate(texts)],
            "doc_id long, text string, source string",
        )
        (r,) = charclass_composition(df, "text", "source").collect()
        ref = self._ref(texts)
        assert r.n_chars == ref["nc"]
        assert r.letters_micro == self._micro(ref["let"], ref["nc"])
        assert r.digits_micro == self._micro(ref["dig"], ref["nc"])
        assert r.ws_micro == self._micro(ref["ws"], ref["nc"])
        assert r.punct_micro == self._micro(ref["pun"], ref["nc"])
        assert r.ctrl_micro == self._micro(ref["ctl"], ref["nc"])
        assert r.other_micro == self._micro(ref["oth"], ref["nc"])
