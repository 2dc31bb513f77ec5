"""Deterministic synthetic Common-Crawl-style page table (FIXTURES.md F1).

Generates the north-rule input shape
``(url string, warc_ts timestamp, html binary, text string, lang string)``
entirely inside Spark — ``spark.range`` + column expressions for all
scalar fields, one ``mapInPandas`` (Arrow-batched zlib) for the gzip
``html`` payload. No external data; seed-stable across runs and
parallelism levels.

The payload carried inside ``html`` is an OpenAlex-style JSON work
record plus an outlink list, so the crawl loop exercises the
reference's decode→parse→extract path end-to-end
(reference decompress.cpp:39-52 gzip decode; openalex_json.cpp work
parsing). The ``text`` column holds the expected extracted text —
the byte-identical-per-url golden (BASELINE.json input_hint).

Scale/skew design (FIXTURES.md F1): host 0 owns ~30% of pages (hot
host); a small fraction of rows are duplicate URLs with messy
variants (default port, unsorted query, fragment) so canonicalized
dedup is observable.
"""

from __future__ import annotations

import gzip
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HOSTS = 20
LINKS_PER_PAGE = 4
LANGS = ("en", "de", "fr", "it", "es")


def _host_id_expr(i):
    # ~30% of pages on host 0, rest spread over hosts 1..N_HOSTS-1
    return F.when(i % 10 < 3, F.lit(0)).otherwise((i % (N_HOSTS - 1)) + 1)


def page_url(i) -> "F.Column":
    """Canonical URL of page i (deterministic)."""
    host = _host_id_expr(i)
    return F.concat(
        F.lit("http://host"),
        host.cast("string"),
        F.lit(".example.org/page/"),
        i.cast("string"),
    )


def _messy_url(i) -> "F.Column":
    """Messy variant that canonicalizes to page_url(i)."""
    host = _host_id_expr(i)
    return F.concat(
        F.lit("HTTP://Host"),
        host.cast("string"),
        F.lit(".Example.ORG:80/page/"),
        i.cast("string"),
        F.lit("/#frag"),
    )


def _link_targets(i, n_pages: int) -> list["F.Column"]:
    """Deterministic outlink page ids: fixed affine maps mod n."""
    muls = [(7, 1), (13, 5), (3, 11), (17, 2)][:LINKS_PER_PAGE]
    return [(i * a + b) % n_pages for a, b in muls]


def page_text(i) -> "F.Column":
    """The golden extracted text for page i — pure column math so the
    expected bytes are reproducible anywhere (including the pytest
    oracle) without running the crawl."""
    return F.concat(
        F.lit("Work W"),
        i.cast("string"),
        F.lit(": collaboration study #"),
        ((i * 2654435761) % 1000000).cast("string"),
        F.lit(" of host "),
        _host_id_expr(i).cast("string"),
        F.lit("."),
    )


def build_pages(
    spark: SparkSession,
    n_pages: int = 2000,
    dup_frac_mod: int = 11,
    payload_repeat: int = 1,
) -> DataFrame:
    """The synthetic web: one row per page + messy-duplicate rows for
    every ``dup_frac_mod``-th page. html is the gzip payload; text is
    the extraction golden. ``payload_repeat`` pads the JSON body with
    a filler field (text × K) so decode cost scales for benchmarks
    without touching the goldens."""
    base = spark.range(n_pages).withColumnRenamed("id", "i")
    i = F.col("i")
    abs_links = F.array(
        *[
            page_url(t)
            for t in _link_targets(i, n_pages)
        ]
    )
    # every 13th page also carries a non-absolute link (relative path /
    # mailto:) — exercises the canonicalizer's malformed-URL
    # passthrough guard end-to-end (such links enqueue as distinct
    # never-fetchable frontier entries, exactly like the oracle)
    messy_link = F.when(
        i % 13 == 5, F.array(F.concat(F.lit("/relative/res-"), i.cast("string")))
    ).when(i % 13 == 9, F.array(F.lit("mailto:author@example.org"))).otherwise(
        F.array().cast("array<string>")
    )
    links = F.concat(abs_links, messy_link)
    canon = base.select(
        i,
        page_url(i).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + i * 7 + _host_id_expr(i)).alias("warc_ts"),
        page_text(i).alias("text"),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]), (i % len(LANGS) + 1).cast("int")).alias(
            "lang"
        ),
        links.alias("links"),
    )
    messy = (
        base.where(i % dup_frac_mod == 3)
        .select(
            i,
            _messy_url(i).alias("url"),
            F.timestamp_seconds(F.lit(1704067200) + i * 7 + 999).alias("warc_ts"),
            page_text(i).alias("text"),
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]), (i % len(LANGS) + 1).cast("int")
            ).alias("lang"),
            links.alias("links"),
        )
    )
    both = canon.unionByName(messy)

    schema = (
        "i bigint, url string, warc_ts timestamp, html binary, text string, lang string"
    )

    def gzip_payload(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i_val, text, links in zip(pdf["i"], pdf["text"], pdf["links"]):
                record = {
                    "id": f"https://openalex.org/W{int(i_val)}",
                    "text": text,
                    "links": list(links),
                    "publication_year": 1990 + int(i_val) % 30,
                }
                if payload_repeat > 1:
                    record["filler"] = text * payload_repeat
                body = json.dumps(record, sort_keys=True, separators=(",", ":"))
                # gzip with fixed mtime+level → byte-deterministic
                payloads.append(gzip.compress(body.encode("utf-8"), compresslevel=6, mtime=0))
            out = pdf[["i", "url", "warc_ts", "text", "lang"]].copy()
            out["html"] = payloads
            yield out[["i", "url", "warc_ts", "html", "text", "lang"]]

    return both.mapInPandas(gzip_payload, schema=schema).drop("i")


def build_seeds(spark: SparkSession, n_pages: int = 2000, n_seeds: int = 8) -> DataFrame:
    """Seed list: the first pages of a few hosts, priority = seed rank."""
    base = spark.range(n_seeds).withColumnRenamed("id", "k")
    k = F.col("k")
    return base.select(
        page_url(k * 97 % n_pages).alias("url"),
        (F.lit(100) - k).cast("int").alias("priority"),
    )


def build_politeness(spark: SparkSession, default_per_batch: int = 8, hot_per_batch: int = 4) -> DataFrame:
    """Per-host max fetches per micro-batch (token budget). The hot
    host gets a tighter budget — politeness throttles exactly where
    skew lives."""
    hosts = spark.range(N_HOSTS).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".example.org")).alias("host"),
        F.when(F.col("id") == 0, F.lit(hot_per_batch))
        .otherwise(F.lit(default_per_batch))
        .cast("int")
        .alias("max_per_batch"),
    )
    return hosts


def build_robots(spark: SparkSession) -> DataFrame:
    """robots.txt cache: host → disallowed path prefixes. host1 blocks
    /page/1 prefixes (a visible bite out of the crawl)."""
    rows = [
        ("host1.example.org", ["/page/1"]),
        ("host2.example.org", ["/private"]),
    ]
    return spark.createDataFrame(rows, "host string, disallow array<string>")


# Fixed world parameters for the driver-gate `crawl_order_prefix`
# query: the query callable (Spark CrawlEngine) and
# tools/build_crawl_golden.py (sequential OracleCrawler) MUST build
# the identical world, so the parameters live here once. Sized so the
# full crawl finishes in a handful of seconds at gate time while the
# hot-host cap (3/batch on host0's ~30% of pages) still forces the
# politeness path to bind across many batches.
GATE_WORLD = {
    "n_pages": 120,
    "n_seeds": 4,
    "default_per_batch": 5,
    "hot_per_batch": 3,
    "default_per_host": 5,
    "max_batches": 40,
}


def build_gate_world(spark: SparkSession, root: str) -> dict:
    """Materialize the GATE_WORLD inputs under ``root``; returns the
    kwargs for a CrawlEngine over them (state_dir included)."""
    import os

    pages_path = os.path.join(root, "pages")
    build_pages(spark, n_pages=GATE_WORLD["n_pages"]).write.mode("overwrite").parquet(
        pages_path
    )
    return {
        "pages_path": pages_path,
        "state_dir": os.path.join(root, "state"),
        "politeness": build_politeness(
            spark,
            default_per_batch=GATE_WORLD["default_per_batch"],
            hot_per_batch=GATE_WORLD["hot_per_batch"],
        ),
        "robots": build_robots(spark),
        "default_per_host": GATE_WORLD["default_per_host"],
    }


def build_zipf_frontier(
    spark: SparkSession,
    n_rows: int = 3_000_000,
    n_hosts: int = 1000,
    hot_frac: float = 0.35,
) -> DataFrame:
    """Synthetic hot-host frontier for the skew harness: ``hot_frac``
    of all candidate URLs live on host 0 (a zipf-head web in one
    knob — Common-Crawl frontiers routinely put tens of percent of
    the queue on a handful of megasites), the rest spread over a
    power-law-ish tail of ``n_hosts - 1`` hosts. Deterministic pure
    column math; schema matches the engine's pending table
    (url, url_hash, host, depth, priority)."""
    from openalex_collaboration_crawler_spark.functions.url import (
        url_hash_canonical,
        url_host,
    )

    i = F.col("id")
    u = (i * 2654435761 % 1_000_000) / 1_000_000.0
    # tail host via a square transform: low tail ids get more mass
    tail = (F.floor(F.pow((i * 40503 % 65536) / 65536.0, F.lit(2.0)) * (n_hosts - 1)) + 1).cast("int")
    host_id = F.when(u < F.lit(hot_frac), F.lit(0)).otherwise(tail)
    url = F.concat(
        F.lit("http://host"), host_id.cast("string"), F.lit(".example.org/page/"), i.cast("string")
    )
    return spark.range(n_rows).select(
        url.alias("url"),
        url_hash_canonical(url).alias("url_hash"),
        url_host(url).alias("host"),
        (i % 4).cast("int").alias("depth"),
        (i % 3).cast("int").alias("priority"),
    )
