"""Adversarial-corpus differential arm (r12 verdict task 4).

The driver-generated /root/testdata corpora are 100 % pure ASCII
(judge-verified r12), so the standard ``tests/oracle_check.py`` run
STRUCTURALLY cannot catch engine-semantics divergence classes — Java
regex vs RE2 ``\\s`` membership (``\\x0B``), ``(?iu)`` vs ``lower()``
case folding (Turkish İ, Kelvin sign K), NUL bytes, empty strings.
That is exactly how the r9–r12 quality-family driver reds slipped
through three rounds of local green.

This module builds a small adversarial documents corpus (control
chars, NBSP, Turkish İ, Kelvin sign, NUL, empties, emoji, multi-space
runs) into a tmp sf_dir that reuses the sf0.001 tables for everything
else, then replays the text-family ``queries()`` entries against their
``oracle_sql()`` on it — the same compare the driver's CORRECTNESS
gate performs.  A final test pins the historical divergence itself:
the pre-r13 Java-regex punct count and RE2's disagree on ``\\x0B``,
while the byte-explicit translate count is identical on both engines —
i.e. this fixture WOULD have caught the r12 bug.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR
from tests.oracle_check import _normalize

# Every divergence class the r12 judge probed, plus a few more.
ADVERSARIAL_TEXTS = [
    "the quick\x0bbrown fox and the dog",  # \x0B: Java-\s yes, RE2-\s no
    "THE AND of To a IS THAT for it",  # ASCII case folds
    "İstanbul the SİGMA test",  # Turkish dotted capital I (U+0130)
    "Kelvin K sign the and",  # Kelvin sign K folds to k under ICU
    "nbsp the and for",  # NBSP: non-ASCII whitespace
    "",  # empty text
    " ",  # single space: two empty tokens
    "  the   and  ",  # multi-space runs / empty tokens
    "the the the the",  # consecutive stopwords
    "emoji 🎉 the ΣΩ mixed 🚀🚀",  # non-BMP + greek
    "nul\x00the and nul\x00nul",  # embedded NUL bytes
    "tab\tthe\nand for it\r\n",  # tabs/newlines inside tokens
    "ß the ẞ and",  # sharp s / capital sharp s
    "ﬁle the ﬂow and",  # ligature chars
    "a" * 500 + " the and",  # long token
    "1234 5678 the 9.99 -42",  # digits and punctuation
    "short",  # single word, no stopwords
    "Ⅻ ⅛ the ② and",  # numeric-like unicode
    "ẖ ṫ the ʼn and",  # combining-char casefold edge
    "the. and, of; to: a!",  # punctuation glued to stopwords
    "bad�decode the zero​width and b‮idi",  # U+FFFD / ZWSP / RLO
    "bom﻿mark the joiner‍‌ and nbsp",  # BOM / ZWJ / ZWNJ / NBSP
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    """A tmp sf_dir: adversarial documents.parquet + the sf0.001
    parquet files for every other table (copied so bare-path reads and
    globs behave exactly like the real layout)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_sf")
    langs = ["en", "de", "fr", "es", "zh"]
    sources = ["src0", "src1", "src2"]
    rows = {
        "doc_id": list(range(len(ADVERSARIAL_TEXTS))),
        "text": ADVERSARIAL_TEXTS,
        "lang": [langs[i % len(langs)] for i in range(len(ADVERSARIAL_TEXTS))],
        "source": [
            sources[i % len(sources)] for i in range(len(ADVERSARIAL_TEXTS))
        ],
        "n_chars": [len(t) for t in ADVERSARIAL_TEXTS],
    }
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(pa.table(rows, schema=schema), d / "documents.parquet")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings".split()
    ):
        src = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copy(src, d / f"{t}.parquet")
    return str(d)


# The text-family entries that read documents.text — every one must
# replay bit-identically on the adversarial corpus.
TEXT_FAMILY = [
    "corpus_fingerprint",
    "quality_class_probe",
    "threshold_sweep_probe",
    "filter_threshold_sweep",
    "filter_interaction_matrix",
    "blocklist_report",
    "lexical_diversity",
    "text_quality",
    "text_lang_id",
    # r13 late entries: length/split/aggregate-lambda (fertility) and
    # the qmicro window rank (exemplars) must stay engine-stable on
    # control chars / non-ASCII / NUL / empty texts
    "tokenizer_fertility",
    "quality_exemplars",
    "jaccard_threshold_curve",
    # r13 late entries built FOR this corpus class: explicit-alphabet
    # translate counts (charclass/anomaly) and fixed-width affix keys
    # must replay bit-identically on control chars / NBSP / zero-width
    # / NUL / empty texts
    "charclass_composition",
    "unicode_anomaly_report",
    "boilerplate_affixes",
    "langid_confusion",
    "markup_residue_report",
    "source_entropy_report",
    "heaps_law_fit",
    "text_token_stats",
    "length_quantiles",
    "canary_scan",
    # split/md5-primitive entries: engine-stable by construction, in
    # the arm to pin that they STAY so on non-ASCII/control-char text
    "text_repetition",
    "boilerplate_grams",
    "heavy_hitter_tokens",
    "pmi_collocations",
    "doc_length_histogram",
    "text_fingerprint",
    # lower()-using entries: Spark ICU lower vs DuckDB lower agree on
    # these corpora (İ/K/NUL probed) — pinned so a regression shows
    "dedup_normalized",
    "pipeline_stage_counts",
    "corpus_diff_report",
    "dataset_card",
]


@pytest.fixture(scope="module")
def duck_con(adv_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(adv_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", TEXT_FAMILY)
def test_text_entry_matches_oracle_on_adversarial_corpus(
    spark, adv_dir, duck_con, name
):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    oracle = entrymod.oracle_sql()[name]

    df = fn(spark, adv_dir)
    spark_cols = [c.lower() for c in df.columns]
    spark_rows = [tuple(r) for r in df.collect()]

    res = duck_con.execute(oracle)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    a = _normalize(spark_cols, spark_rows)
    b = _normalize(duck_cols, duck_rows)
    diff = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diff, f"{name}: first value diff {diff[0]}"


def test_fixture_catches_the_r12_class(spark, duck_con):
    """Pin the historical bug: on '\\x0B' the engines' regex `\\s`
    classes disagree (Java counts 0 punct, RE2 counts 1), while the
    byte-explicit translate count is 0 on BOTH — so this fixture fails
    loudly on the pre-r13 regex code path and passes on the new one.
    Cites the r12 judge repro (VERDICT.md, sum_punct 0 vs 1)."""
    from shaper_spark.operators.text import punct_count_sql

    java_regex = spark.sql(
        "SELECT regexp_count('a' || chr(11) || 'b', "
        "'[^A-Za-z0-9\\\\s]') AS c"
    ).collect()[0]["c"]
    re2_regex = duck_con.execute(
        "SELECT length(regexp_replace('a' || chr(11) || 'b', "
        "'[A-Za-z0-9\\s]', '', 'g')) AS c"
    ).fetchone()[0]
    assert java_regex == 0 and re2_regex == 1  # the r12 divergence

    spark_new = spark.sql(
        "SELECT " + punct_count_sql("'a' || chr(11) || 'b'") + " AS c"
    ).collect()[0]["c"]
    duck_new = duck_con.execute(
        "SELECT " + punct_count_sql("'a' || chr(11) || 'b'") + " AS c"
    ).fetchone()[0]
    assert spark_new == duck_new == 0


def test_stopword_count_is_engine_identical_on_casefold_edges(
    spark, duck_con
):
    """İ (U+0130) and K (U+212A) fold to ASCII i/k under ICU lower()
    but NOT under the explicit 26-char translate — and both engines
    agree on the translate by construction."""
    from shaper_spark.operators.text import (
        LANG_STOPWORDS,
        folded_padded_sql,
        stopword_count_sql,
    )

    text_sql = "'İT the IT In' "  # İT: ICU-folds to 'it'; translate does not
    pad = folded_padded_sql(text_sql)
    s_spark = spark.sql(
        "SELECT "
        + stopword_count_sql(pad, LANG_STOPWORDS["en"], "DIV")
        + " AS c"
    ).collect()[0]["c"]
    s_duck = duck_con.execute(
        "SELECT "
        + stopword_count_sql(pad, LANG_STOPWORDS["en"], "//")
        + " AS c"
    ).fetchone()[0]
    # 'the', 'IT'→'it', 'In'→'in' match; 'İT' must NOT (defined
    # semantics: no ICU fold)
    assert s_spark == s_duck == 3
