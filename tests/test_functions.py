"""Unit + differential tests for the column-expression library."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from openalex_collaboration_crawler_spark.functions import text as TX
from openalex_collaboration_crawler_spark.functions import url as U
from openalex_collaboration_crawler_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)
from tests.oracle import crawler_oracle as ORC


def test_portable_hash_matches_duckdb_and_python(spark):
    vals = ["", "a", "hello world", "https://x.org/?a=1", "ünïcode"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", portable_hash64("s").alias("h")).collect()}
    con = duckdb.connect()
    con.register("t", df.toPandas())
    dd = {r[0]: r[1] for r in con.sql(f"SELECT s, {portable_hash64_sql('s')} FROM t").fetchall()}
    for v in vals:
        assert got[v] == dd[v] == ORC.portable_hash64(v)


CANON_CASES = [
    ("http://Host.COM:80/a/b/?z=1&a=2#frag", "http://host.com/a/b?a=2&z=1"),
    ("https://x.org:443/", "https://x.org/"),
    ("https://x.org//", "https://x.org/"),
    ("http://h.io/p?b=2&a=1", "http://h.io/p?a=1&b=2"),
    ("HTTP://H.io", "http://h.io/"),
    ("http://h.io:8080/x", "http://h.io:8080/x"),  # non-default port kept
]


@pytest.mark.parametrize("raw,expected", CANON_CASES)
def test_canonicalize_url(spark, raw, expected):
    row = spark.createDataFrame([(raw,)], ["url"]).select(
        U.canonicalize_url("url").alias("c")
    ).collect()[0]
    assert row["c"] == expected
    assert ORC.canonicalize_url(raw) == expected  # python oracle agrees


NON_MATCHING = ["mailto:a@b.c", "/relative/path", "", "not a url", "ftp:/oneSlash"]


def test_canonicalize_idempotent_and_hash_canonical(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) — the property
    url_hash_canonical (frontier dedup hot path) relies on to skip the
    re-parse — and url_hash(u) == portable_hash64(canonicalize(u))."""
    raws = [c[0] for c in CANON_CASES] + NON_MATCHING
    df = spark.createDataFrame([(r,) for r in raws], ["url"])
    rows = df.select(
        U.canonicalize_url("url").alias("c1"),
        U.canonicalize_url(U.canonicalize_url("url")).alias("c2"),
        U.url_hash("url").alias("h"),
        U.url_hash_canonical(U.canonicalize_url("url")).alias("hc"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"]
        assert r["h"] == r["hc"]


def test_canonicalize_matches_sql_mirror(spark):
    """The lambda-bound evaluation strategy must stay bit-identical to
    the DuckDB mirror on matches, non-matches, and nulls."""
    raws = [c[0] for c in CANON_CASES] + NON_MATCHING + [None]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got = [r["c"] for r in df.select(U.canonicalize_url("url").alias("c")).collect()]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = [r[0] for r in con.sql(f"SELECT {U.canonicalize_url_sql('url')} FROM t").fetchall()]
    assert got == want


def test_canonicalize_passthrough_non_matching(spark):
    df = spark.createDataFrame([(r,) for r in NON_MATCHING], ["url"])
    got = [r["c"] for r in df.select(U.canonicalize_url("url").alias("c")).collect()]
    assert got == NON_MATCHING  # unchanged, each keeps its own identity


def test_url_host(spark):
    df = spark.createDataFrame([("http://A.b.C:8080/x",)], ["url"])
    assert df.select(U.url_host("url").alias("h")).collect()[0]["h"] == "a.b.c"


def test_text_functions_edge_cases(spark):
    rows = [("",), ("   ",), ("one",), ("the the the and of to in is that with",)]
    df = spark.createDataFrame(rows, ["text"])
    got = df.select(
        TX.token_count("text").alias("n"),
        TX.stopword_count("text").alias("s"),
        TX.lang_id("text").alias("lang"),
    ).collect()
    assert [r["n"] for r in got] == [0, 0, 1, 10]
    assert got[0]["lang"] == "und"
    assert got[3]["lang"] == "en"
    assert got[3]["s"] == 10


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello,  World!",), ("hello world",), ("HELLO   WORLD.",)], ["text"]
    )
    fps = [r["f"] for r in df.select(TX.fingerprint("text").alias("f")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["text"])
    got = [r["sh"] for r in df.select(TX.shingles("text", 3).alias("sh")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]  # shorter than n → whole text
