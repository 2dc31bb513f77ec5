"""Distributed URL-frontier crawl loop with checkpointed state.

This is the engine's north-star component: the reference's
single-machine atomic work-queue over .gz shards
(generation/src/authors.cpp:93-123, papers.cpp:135-166) re-designed
as a batch-iterated frontier over tables.

Design (Iceberg-shaped, parquet-backed in this sandbox):

state_dir/
  frontier/v{N}/      (url, url_hash, host, depth, priority, state,
                       batch_enqueued)        -- the queue
  seen/v{N}/          (url_hash)              -- every URL ever enqueued
  results/batch={k}/  (seq, url, url_hash, host, depth, text, lang,
                       n_links, batch_id)     -- fetched + extracted
  metrics/batch={k}/  per-partition lineage + fetch/dedup/parse counters
  _commits/{N}.json   atomic commit marker (written last)

Each micro-batch:
 1. select fetch set: politeness-capped, robots-filtered,
    deterministically ordered (streaming/politeness.py) → ``seq``.
 2. "fetch": join the batch against the page table on canonical URL
    (the sandbox's network). Duplicate snapshots of a URL resolve by
    (warc_ts, url) min — deterministic.
 3. decode+parse: one Arrow-batched ``mapInPandas`` does gzip decode
    + JSON parse + text/link extraction (reference decompress.cpp:39-52,
    openalex_json.cpp) — no per-row Python UDFs.
 4. discover: explode links → canonicalize → hash → exact-dedup
    against the seen set with a partitioned-Bloom prefilter
    (streaming/seen.py) and against this batch's own links.
 5. commit: new frontier version (pending minus fetched, plus new),
    seen version, results, per-partition metrics; then the commit
    marker. Resume = read the highest committed version — a killed
    run replays from the last marker (idempotent: state transitions
    are pure functions of committed tables).

Crawl ordering is a pure function of the committed data
(depth, -priority, url_hash), so any cluster size produces the same
order — the parity contract checked against the sequential oracle in
tests/test_crawl_parity.py.

At 10^10 URLs: frontier/seen are hash-partitioned Iceberg tables;
the per-batch join against pages is a shuffle on canonical_url;
bloom blobs keep the dedup anti-join to survivors only; hot hosts
are capped by politeness *before* any heavy work, and the explode of
links is salted by ``pmod(url_hash, P)`` at the dedup repartition.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_collaboration_crawler_spark.functions.url import (
    canonicalize_url,
    url_hash,
    url_host,
)
from openalex_collaboration_crawler_spark.streaming.politeness import select_batch
from openalex_collaboration_crawler_spark.streaming.seen import (
    build_bloom_table,
    dedup_against_seen,
)

FRONTIER_SCHEMA = (
    "url string, url_hash bigint, host string, depth int, priority int, "
    "state string, batch_enqueued int"
)
SEEN_SCHEMA = "url_hash bigint"

PARSE_SCHEMA = (
    "seq long, url string, url_hash long, host string, depth int, "
    "text string, lang string, links array<string>, parse_ok boolean, "
    "text_match boolean"
)


def decode_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched gzip decode + JSON parse + extraction.

    Emits extracted text, outlinks, a parse_ok flag and the
    byte-identity check of extracted text vs the page table's golden
    ``text`` column (input_hint invariant, surfaced as a metric)."""
    for pdf in batches:
        texts, links, ok, match = [], [], [], []
        for html, golden in zip(pdf["html"], pdf["text_golden"]):
            if html is None:
                texts.append(None)
                links.append([])
                ok.append(False)
                match.append(False)
                continue
            try:
                body = json.loads(gzip.decompress(bytes(html)).decode("utf-8"))
                t = body.get("text")
                texts.append(t)
                links.append(list(body.get("links", [])))
                ok.append(True)
                match.append(
                    t is not None
                    and golden is not None
                    and t.encode("utf-8") == golden.encode("utf-8")
                )
            except Exception:  # noqa: BLE001 - malformed page == parse failure
                texts.append(None)
                links.append([])
                ok.append(False)
                match.append(False)
        out = pdf[["seq", "url", "url_hash", "host", "depth", "lang"]].copy()
        out["text"] = texts
        out["links"] = links
        out["parse_ok"] = ok
        out["text_match"] = match
        yield out[
            [
                "seq",
                "url",
                "url_hash",
                "host",
                "depth",
                "text",
                "lang",
                "links",
                "parse_ok",
                "text_match",
            ]
        ]


@dataclass
class CrawlEngine:
    spark: SparkSession
    state_dir: str
    pages_path: str  # parquet of the synthetic web (url, warc_ts, html, text, lang)
    politeness: DataFrame
    robots: DataFrame | None = None
    batch_cap: int = 1 << 30
    default_per_host: int = 8
    bloom_parts: int = 16
    use_bloom: bool = True
    _pages_prepared: DataFrame | None = field(default=None, repr=False)

    # ------------------------------------------------------------ state io

    def _commit_dir(self) -> str:
        return os.path.join(self.state_dir, "_commits")

    def last_version(self) -> int:
        d = self._commit_dir()
        if not os.path.isdir(d):
            return -1
        vs = [int(f.split(".")[0]) for f in os.listdir(d) if f.endswith(".json")]
        return max(vs, default=-1)

    def _load(self, name: str, version: int, schema: str) -> DataFrame:
        path = os.path.join(self.state_dir, name, f"v{version}")
        return self.spark.read.schema(schema).parquet(path)

    def _write(self, df: DataFrame, name: str, version: int) -> None:
        path = os.path.join(self.state_dir, name, f"v{version}")
        df.write.mode("overwrite").parquet(path)

    def _commit(self, version: int, payload: dict) -> None:
        os.makedirs(self._commit_dir(), exist_ok=True)
        tmp = os.path.join(self._commit_dir(), f".{version}.json.tmp")
        final = os.path.join(self._commit_dir(), f"{version}.json")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.rename(tmp, final)  # atomic commit point

    # ------------------------------------------------------------- seeding

    def init_from_seeds(self, seeds: DataFrame) -> None:
        """v0: frontier = canonicalized seeds (priority from the seed
        list, depth 0); seen = their hashes. Duplicate seeds collapse
        to max priority (deterministic)."""
        if os.path.isdir(self.state_dir):
            shutil.rmtree(self.state_dir)
        canon = seeds.select(
            canonicalize_url("url").alias("url"), F.col("priority").cast("int").alias("priority")
        )
        frontier = (
            canon.groupBy("url")
            .agg(F.max("priority").alias("priority"))
            .select(
                "url",
                url_hash("url").alias("url_hash"),
                url_host("url").alias("host"),
                F.lit(0).cast("int").alias("depth"),
                "priority",
                F.lit("pending").alias("state"),
                F.lit(0).cast("int").alias("batch_enqueued"),
            )
        )
        self._write(frontier, "frontier", 0)
        self._write(frontier.select("url_hash"), "seen", 0)
        self._commit(0, {"batch": -1, "note": "seeded"})

    # -------------------------------------------------------------- pages

    def _pages(self) -> DataFrame:
        """The 'network': canonical_url → one deterministic snapshot.

        Canonicalization happens scan-side; duplicate snapshots (messy
        URL variants) resolve by min (warc_ts, url)."""
        if self._pages_prepared is not None:
            return self._pages_prepared
        from pyspark.sql.window import Window

        raw = self.spark.read.parquet(self.pages_path)
        keyed = raw.select(
            canonicalize_url("url").alias("canonical_url"),
            "warc_ts",
            "html",
            F.col("text").alias("text_golden"),
            "lang",
        )
        w = Window.partitionBy("canonical_url").orderBy("warc_ts", "html")
        self._pages_prepared = (
            keyed.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
        ).cache()
        return self._pages_prepared

    # ---------------------------------------------------------- one batch

    def run_batch(self) -> dict:
        """Run one micro-batch; returns its metric dict.
        No pending URLs → returns {"fetched": 0} without committing."""
        v = self.last_version()
        frontier = self._load("frontier", v, FRONTIER_SCHEMA)
        seen = self._load("seen", v, SEEN_SCHEMA)
        batch_id = v + 1

        pending = frontier.where(F.col("state") == "pending")
        batch = select_batch(
            pending,
            self.politeness,
            self.robots,
            batch_cap=self.batch_cap,
            default_per_host=self.default_per_host,
        ).select("seq", "url", "url_hash", "host", "depth", "priority")
        batch = batch.cache()
        n_batch = batch.count()
        if n_batch == 0:
            batch.unpersist()
            return {"batch": batch_id, "fetched": 0, "done": True}

        # fetch + decode + parse (one shuffle: join on canonical url)
        fetched = batch.join(self._pages(), batch.url == F.col("canonical_url"), "left").select(
            "seq", "url", "url_hash", "host", "depth", "html", "text_golden", "lang"
        )
        parsed = fetched.mapInPandas(decode_and_parse, schema=PARSE_SCHEMA).cache()

        results = parsed.select(
            "seq",
            "url",
            "url_hash",
            "host",
            "depth",
            "text",
            "lang",
            F.size("links").alias("n_links"),
            "parse_ok",
            "text_match",
            F.lit(batch_id).alias("batch_id"),
        )
        self._write_results(results, batch_id)

        # discover links → canonical → dedup (bloom prefilter + exact)
        discovered = (
            parsed.select(F.explode("links").alias("raw_url"), F.col("depth").alias("pdepth"))
            .select(
                canonicalize_url("raw_url").alias("url"),
                (F.col("pdepth") + 1).cast("int").alias("depth"),
            )
            .groupBy("url")
            .agg(F.min("depth").alias("depth"))
            .select(
                "url",
                url_hash("url").alias("url_hash"),
                url_host("url").alias("host"),
                F.col("depth"),
                F.lit(0).cast("int").alias("priority"),
            )
        )
        n_discovered = discovered.count()
        bloom = (
            build_bloom_table(seen, n_parts=self.bloom_parts) if self.use_bloom else None
        )
        new_urls = dedup_against_seen(discovered, seen, bloom, n_parts=self.bloom_parts).select(
            "url",
            "url_hash",
            "host",
            "depth",
            F.col("priority"),
            F.lit("pending").alias("state"),
            F.lit(batch_id).cast("int").alias("batch_enqueued"),
        )
        new_urls = new_urls.cache()
        n_new = new_urls.count()

        # next frontier: flip fetched rows, append new pending rows
        fetched_hashes = batch.select("url_hash")
        next_frontier = (
            frontier.join(fetched_hashes, "url_hash", "left_semi")
            .withColumn("state", F.lit("fetched"))
            .unionByName(frontier.join(fetched_hashes, "url_hash", "left_anti"))
            .unionByName(new_urls)
        )
        next_seen = seen.unionByName(new_urls.select("url_hash"))

        self._write(next_frontier, "frontier", batch_id)
        self._write(next_seen, "seen", batch_id)

        # metrics: batch counters + per-partition lineage
        agg = parsed.agg(
            F.count("*").alias("fetched"),
            F.sum(F.col("parse_ok").cast("int")).alias("parsed_ok"),
            F.sum(F.col("text_match").cast("int")).alias("text_match"),
        ).collect()[0]
        metrics = {
            "batch": batch_id,
            "fetched": int(agg["fetched"]),
            "parsed_ok": int(agg["parsed_ok"] or 0),
            "text_match": int(agg["text_match"] or 0),
            "discovered": int(n_discovered),
            "new_urls": int(n_new),
            "deduped": int(n_discovered - n_new),
            "done": False,
        }
        self._write_partition_metrics(parsed, batch_id)
        self._commit(batch_id, metrics)
        batch.unpersist()
        parsed.unpersist()
        new_urls.unpersist()
        return metrics

    def _write_results(self, results: DataFrame, batch_id: int) -> None:
        path = os.path.join(self.state_dir, "results", f"batch={batch_id}")
        results.write.mode("overwrite").parquet(path)

    def _write_partition_metrics(self, parsed: DataFrame, batch_id: int) -> None:
        """Per-partition lineage: which task partition produced how many
        fetches/parses (north rule 'per-partition lineage and
        fetch/dedup/parse metrics')."""
        per_part = (
            parsed.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(
                F.count("*").alias("fetched"),
                F.sum(F.col("parse_ok").cast("int")).alias("parsed_ok"),
                F.sum(F.col("text_match").cast("int")).alias("text_match"),
                F.min("url_hash").alias("min_url_hash"),
                F.max("url_hash").alias("max_url_hash"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        path = os.path.join(self.state_dir, "metrics", f"batch={batch_id}")
        per_part.write.mode("overwrite").parquet(path)

    # ------------------------------------------------------------ the loop

    def run(self, max_batches: int = 1000) -> list[dict]:
        """Crawl until the frontier drains or max_batches."""
        out = []
        for _ in range(max_batches):
            m = self.run_batch()
            out.append(m)
            if m.get("done") or m.get("fetched", 0) == 0:
                break
        return out

    # ----------------------------------------------------------- accessors

    def results(self) -> DataFrame:
        return self.spark.read.option("basePath", os.path.join(self.state_dir, "results")).parquet(
            os.path.join(self.state_dir, "results", "batch=*")
        )

    def crawl_order(self) -> list[tuple[int, int, str]]:
        """[(batch_id, seq, url)] — the engine's total crawl order."""
        rows = (
            self.results()
            .select("batch_id", "seq", "url")
            .orderBy("batch_id", "seq")
            .collect()
        )
        return [(r["batch_id"], r["seq"], r["url"]) for r in rows]

    def seen_hashes(self) -> set[int]:
        v = self.last_version()
        return {
            r["url_hash"]
            for r in self._load("seen", v, SEEN_SCHEMA).collect()
        }
