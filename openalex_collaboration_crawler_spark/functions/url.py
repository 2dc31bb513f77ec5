"""URL canonicalization + hashing (north-rule core).

The reference's "URL" analogue is a filesystem path to a .gz shard
(generation/src/decompress.cpp:82-90); its dedup key is the raw path.
A real 10^10-URL frontier needs canonical URLs so that
``http://Host.com:80/a/?b=2&a=1#x`` and ``http://host.com/a?a=1&b=2``
dedup to one entry.

Everything is built-in column ops (regexp + array_sort) so the exact
same normalization is expressible in the DuckDB oracle —
:func:`canonicalize_url_sql` emits the mirror SQL text. Keeping it
JVM-side also means canonicalization runs inside whole-stage codegen
at scan time (no Python round-trip per URL).

Canonical form:
  - scheme + host lowercased
  - default ports stripped (``:80`` http / ``:443`` https)
  - fragment removed
  - query parameters sorted bytewise (empty query → no ``?``)
  - path ``''`` → ``/``; trailing slashes trimmed (except root)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from openalex_collaboration_crawler_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

_URL_RX = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?"

# Column-expression memo for string-named inputs (r6): building the
# canonicalizer is ~100 py4j round-trips (~0.2 s of driver wall) — the
# crawl loop rebuilt it EVERY batch even though the expression tree is
# a pure function of the input column name. Column objects are
# immutable and reusable across plans; the JVM gateway outlives
# SparkSession cycles within a process, so a process-level cache is
# safe. Column-typed inputs (dynamic exprs) bypass the cache.
_COL_CACHE: dict = {}


def _cached(kind: str, name: str, build) -> Column:
    key = (kind, name)
    col = _COL_CACHE.get(key)
    if col is None:
        col = build()
        _COL_CACHE[key] = col
    return col


def _parts(url: Column) -> tuple[Column, Column, Column, Column]:
    scheme = F.lower(F.regexp_extract(url, _URL_RX, 1))
    authority = F.lower(F.regexp_extract(url, _URL_RX, 2))
    path = F.regexp_extract(url, _URL_RX, 3)
    query = F.regexp_extract(url, _URL_RX, 4)
    return scheme, authority, path, query


def canonicalize_url(col: Column | str) -> Column:
    """Canonical URL; non-absolute inputs (relative links, mailto:,
    malformed) pass through UNCHANGED — without the guard every
    non-matching URL would canonicalize to the same ``':///'`` string
    and one shared hash, corrupting the seen set on any real corpus.

    Evaluation strategy (measured, BENCH/BASELINE.md §2.1): a naive
    single-expression form evaluates the URL regex 12+ times per row —
    Catalyst's codegen subexpression elimination skips expressions
    under conditional CASE WHEN branches, so nothing is shared and
    the canonicalizer alone measured ~0.4 ms/URL (1,221 core-s for a
    3M-page prepare). Higher-order-function lambda variables ARE
    bound once per element, so the parts are extracted exactly once
    into a struct and every downstream reference is a cheap field
    read: 4 full-URL regex evaluations per row instead of 12+ (the
    rlike guard is also folded away — group 1 is non-empty iff the
    regex matches). Semantics are bit-identical to the naive form;
    the DuckDB mirror (:func:`canonicalize_url_sql`) is unchanged."""
    if isinstance(col, str):
        return _cached("canon", col, lambda: canonicalize_url(F.col(col)))
    url = col
    scheme, authority, path, query = _parts(url)
    level0 = F.array(
        F.struct(
            scheme.alias("scheme"),
            authority.alias("auth"),
            path.alias("path"),
            query.alias("query"),
            url.alias("url"),
        )
    )

    def _level1(p: Column) -> Column:
        scheme, auth = p["scheme"], p["auth"]
        host = (
            F.when(
                (scheme == "http") & auth.endswith(":80"),
                F.regexp_replace(auth, ":80$", ""),
            )
            .when(
                (scheme == "https") & auth.endswith(":443"),
                F.regexp_replace(auth, ":443$", ""),
            )
            .otherwise(auth)
        )
        return F.struct(
            scheme.alias("scheme"),
            host.alias("host"),
            F.regexp_replace(p["path"], "/+$", "").alias("trimmed"),
            F.array_join(F.array_sort(F.split(p["query"], "&")), "&").alias("q"),
            p["url"].alias("url"),
        )

    def _level2(p: Column) -> Column:
        norm_path = F.when(p["trimmed"] == "", F.lit("/")).otherwise(p["trimmed"])
        q_suffix = F.when(p["q"] == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), p["q"])
        )
        return F.when(p["scheme"] == "", p["url"]).otherwise(
            F.concat(p["scheme"], F.lit("://"), p["host"], norm_path, q_suffix)
        )

    return F.element_at(F.transform(F.transform(level0, _level1), _level2), 1)


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB SQL computing the identical canonical URL string
    (including the non-matching-URL passthrough guard)."""
    rx = _URL_RX
    scheme = f"lower(regexp_extract({expr}, '{rx}', 1))"
    auth = f"lower(regexp_extract({expr}, '{rx}', 2))"
    path = f"regexp_extract({expr}, '{rx}', 3)"
    query = f"regexp_extract({expr}, '{rx}', 4)"
    host = (
        f"CASE WHEN {scheme} = 'http' AND {auth} LIKE '%:80' THEN regexp_replace({auth}, ':80$', '') "
        f"WHEN {scheme} = 'https' AND {auth} LIKE '%:443' THEN regexp_replace({auth}, ':443$', '') "
        f"ELSE {auth} END"
    )
    trimmed = f"regexp_replace({path}, '/+$', '')"
    norm_path = f"CASE WHEN {trimmed} = '' THEN '/' ELSE {trimmed} END"
    sorted_q = f"array_to_string(list_sort(string_split({query}, '&')), '&')"
    q_suffix = f"CASE WHEN {sorted_q} = '' THEN '' ELSE '?' || {sorted_q} END"
    canon = f"({scheme} || '://' || {host} || {norm_path} || {q_suffix})"
    return f"(CASE WHEN regexp_matches({expr}, '{rx}') THEN {canon} ELSE {expr} END)"


def url_host(col: Column | str) -> Column:
    """Lowercased host (port stripped) — the politeness-scheduler key."""
    if isinstance(col, str):
        return _cached("host", col, lambda: url_host(F.col(col)))
    _, authority, _, _ = _parts(col)
    return F.regexp_replace(authority, ":[0-9]+$", "")


def url_host_sql(expr: str) -> str:
    auth = f"lower(regexp_extract({expr}, '{_URL_RX}', 2))"
    return f"regexp_replace({auth}, ':[0-9]+$', '')"


def url_hash(col: Column | str) -> Column:
    """Stable 60-bit hash of the canonical URL — the seen-set key."""
    return portable_hash64(canonicalize_url(col))


def url_hash_canonical(col: Column | str) -> Column:
    """``url_hash`` for a column that is ALREADY canonical (the
    output of :func:`canonicalize_url`). Canonicalization is
    idempotent — the canonical form re-parses to itself (scheme/host
    already lowered, default port already stripped, path already
    trimmed with '' → '/', query already sorted) — so
    ``url_hash(canon) == portable_hash64(canon)`` and re-running the
    4-regex parse is pure waste. The crawl's dedup phase hashes every
    distinct discovered URL per batch; skipping the re-parse there
    removes one full canonicalization pass per URL (measured in
    BENCH/BASELINE.md §2.1). tests/test_functions.py pins the
    idempotence property."""
    c = F.col(col) if isinstance(col, str) else col
    return portable_hash64(c)


def url_hash_sql(expr: str) -> str:
    return portable_hash64_sql(canonicalize_url_sql(expr))
