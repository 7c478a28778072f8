"""DuckDB-parity scalar UDFs (shaper_spark/udfs.py) — stdlib-pure,
registered per session; values differential-checked against DuckDB
where DuckDB 1.0 has the function."""

from __future__ import annotations

import pytest


@pytest.fixture()
def sql(spark):
    def run(q):
        return [tuple(r) for r in spark.sql(q).collect()]

    return run


class TestCompatUdfs:
    def test_damerau_levenshtein_matches_duckdb(self, sql):
        import duckdb

        con = duckdb.connect()
        for a, b in [
            ("abc", "acb"), ("kitten", "sitting"), ("", "xy"),
            ("same", "same"), ("ca", "abc"),
        ]:
            want = con.execute(
                f"SELECT damerau_levenshtein('{a}', '{b}')"
            ).fetchall()[0][0]
            got = sql(f"SELECT damerau_levenshtein('{a}', '{b}')")[0][0]
            assert got == want, (a, b)

    def test_jaro_winkler_matches_duckdb(self, sql):
        import duckdb

        con = duckdb.connect()
        for a, b in [
            ("martha", "marhta"), ("dixon", "dicksonx"),
            ("jellyfish", "smellyfish"), ("abc", "abc"), ("a", "b"),
        ]:
            want = con.execute(
                f"SELECT round(jaro_winkler_similarity('{a}', '{b}'), 9)"
            ).fetchall()[0][0]
            got = sql(
                f"SELECT round(jaro_winkler_similarity('{a}', '{b}'), 9)"
            )[0][0]
            assert abs(got - want) < 1e-9, (a, b, got, want)

    def test_unicode_helpers(self, sql):
        assert sql("SELECT strip_accents('café naïve')")[0][0] == (
            "cafe naive"
        )
        assert sql("SELECT nfc_normalize('café')")[0][0] == "café"

    def test_path_and_url(self, sql):
        assert sql("SELECT parse_dirname('/a/b/c.txt')")[0][0] == "/"
        assert sql("SELECT parse_dirname('a/b')")[0][0] == "a"
        assert sql("SELECT parse_filename('/a/b/c.txt')")[0][0] == "c.txt"
        assert sql("SELECT parse_path('/a/b')")[0][0] == ["/", "a", "b"]
        assert sql("SELECT url_encode('a b&c')")[0][0] == "a%20b%26c"
        assert sql("SELECT url_decode('a%20b')")[0][0] == "a b"

    def test_math(self, sql):
        assert sql("SELECT gamma(5.0)")[0][0] == 24.0
        assert abs(sql("SELECT lgamma(5.0)")[0][0] - 3.1780538) < 1e-6
        assert sql("SELECT signbit(-1.5)")[0][0] is True
        assert sql("SELECT signbit(1.5)")[0][0] is False
        assert sql("SELECT gamma(-1.0)")[0][0] is None  # pole -> NULL

    def test_null_passthrough(self, sql):
        row = sql(
            "SELECT damerau_levenshtein(NULL, 'x'), "
            "jaro_winkler_similarity(NULL, 'x'), strip_accents(NULL)"
        )[0]
        assert row == (None, None, None)
