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
    and one shared hash, corrupting the seen set on any real corpus."""
    url = F.col(col) if isinstance(col, str) else col
    return F.when(url.rlike(_URL_RX), _canonicalize_matched(url)).otherwise(url)


def _canonicalize_matched(url: Column) -> Column:
    scheme, authority, path, query = _parts(url)
    host = (
        F.when(
            (scheme == "http") & authority.endswith(":80"),
            F.regexp_replace(authority, ":80$", ""),
        )
        .when(
            (scheme == "https") & authority.endswith(":443"),
            F.regexp_replace(authority, ":443$", ""),
        )
        .otherwise(authority)
    )
    trimmed = F.regexp_replace(path, "/+$", "")
    norm_path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    q_suffix = F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q))
    return F.concat(scheme, F.lit("://"), host, norm_path, q_suffix)


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
    url = F.col(col) if isinstance(col, str) else col
    _, authority, _, _ = _parts(url)
    return F.regexp_replace(authority, ":[0-9]+$", "")


def url_host_sql(expr: str) -> str:
    auth = f"lower(regexp_extract({expr}, '{_URL_RX}', 2))"
    return f"regexp_replace({auth}, ':[0-9]+$', '')"


def url_hash(col: Column | str) -> Column:
    """Stable 60-bit hash of the canonical URL — the seen-set key."""
    return portable_hash64(canonicalize_url(col))


def url_hash_sql(expr: str) -> str:
    return portable_hash64_sql(canonicalize_url_sql(expr))
