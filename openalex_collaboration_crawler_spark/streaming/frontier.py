"""Distributed URL-frontier crawl loop with checkpointed state.

This is the engine's north-star component: the reference's
single-machine atomic work-queue over .gz shards
(generation/src/authors.cpp:93-123, papers.cpp:135-166) re-designed
as a batch-iterated frontier over tables.

State layout (Iceberg-shaped, parquet-backed in this sandbox):

state_dir/
  pending/v{B}/       (url, url_hash, host, depth, priority,
                       batch_enqueued)  -- the live queue's BASE,
                       rewritten only at compaction points (Iceberg
                       merge-on-read analogue; see the
                       pending_compact_every field)
  pending_add/b{N}/   same schema -- APPEND-ONLY delta of the urls
                       batch N discovered; the logical queue at v is
                       base ∪ adds(B..v] minus everything fetched
                       since B (the results parquet doubles as the
                       equality-delete files -- no delete state)
  seen/b{K}/          (url_hash)        -- APPEND-ONLY delta per batch;
                       the full seen set is the union of deltas, so
                       per-batch write cost is O(|delta|), not O(seen)
  bloom/v{N}/         (part, blob)      -- incremental fixed-size Bloom
                       blobs per hash partition, OR-merged with each
                       delta (never rebuilt over the full set)
  results/batch={k}/  (seq, url, ..., text, lang, n_links, batch_id)
  metrics/batch={k}/  per-partition lineage + fetch/dedup/parse counters
  _commits/{N}.json   atomic commit marker (written last)

Each micro-batch:
 1. select fetch set: politeness-capped, robots-filtered,
    deterministically ordered (streaming/politeness.py) → ``seq``.
 2. "fetch": join the batch against the page table on canonical URL
    (the sandbox's network). Duplicate snapshots of a URL resolve by
    (warc_ts, html) min — deterministic.
 3. decode+parse: one Arrow-batched ``mapInPandas`` does gzip decode
    + JSON parse + text/link extraction (reference decompress.cpp:
    39-52, openalex_json.cpp) — no per-row Python UDFs.
 4. discover: explode links → canonicalize → hash → dedup against the
    seen set: Bloom prefilter kills the already-seen mass; survivors
    are confirmed with broadcast semi/anti joins that only SCAN the
    seen union (zero shuffle of the big table).
 5. commit: pending v+1, seen delta, bloom v+1, results, per-partition
    metrics; then the commit marker. Resume = read the highest
    committed version — a killed run replays from the last marker.

Crawl ordering is a pure function of the committed data
(depth, -priority, url_hash), so any cluster size produces the same
order — the parity contract checked against the sequential oracle in
tests/test_crawl_parity.py.

At 10^10 URLs: pending/seen are hash-partitioned Iceberg tables; the
seen union is compacted by table maintenance; bloom blobs are sized
m_bits ≈ 10 × capacity/partition; hot hosts are capped by politeness
*before* any heavy work.
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

from openalex_collaboration_crawler_spark.functions.hashing import portable_hash64
from openalex_collaboration_crawler_spark.functions.url import (
    canonicalize_url,
    url_hash_canonical,
    url_host,
)
from openalex_collaboration_crawler_spark.streaming.politeness import (
    SMALL_BATCH_ROWS,
    robots_filter,
    select_batch,
    with_robots_blocked,
)
from openalex_collaboration_crawler_spark.streaming.seen import (
    mark_new_against_seen,
    merge_bloom_tables,
)

PENDING_SCHEMA = (
    "url string, url_hash bigint, host string, depth int, priority int, batch_enqueued int"
)
SEEN_SCHEMA = "url_hash bigint"
BLOOM_SCHEMA = "part int, blob binary"

PARSE_SCHEMA = (
    "seq long, url string, url_hash long, host string, depth int, "
    "text string, lang string, links array<string>, parse_ok boolean, "
    "text_match boolean"
)
RESULTS_SCHEMA = (
    "seq long, url string, url_hash long, host string, depth int, "
    "text string, lang string, links array<string>, n_links int, "
    "parse_ok boolean, text_match boolean, batch_id int"
)


def _ref_lit_int(v: int):
    """Integer literal carried as a codegen *reference* instead of an
    inlined source constant — evaluates to exactly ``v``.

    A primitive ``F.lit(v)`` is inlined into the generated Java source,
    so any stage whose plan embeds a per-batch id produces a brand-new
    source string every batch → a fresh Janino compile (~40-70 ms,
    driver-blocking) plus cold-JIT first executions, every batch of
    every crawl (measured via CodegenMetrics: 4-6 recompiles per warm
    batch, ~85 per cold crawl). A single-element ARRAY literal is
    non-primitive, so codegen emits it via the ``references`` array —
    the source is identical for every value — and indexing it with
    ``1 + 0·rand(42)`` (non-foldable because rand is flagged
    non-deterministic; the seed is pinned so ITS source is stable too)
    stops ConstantFolding from collapsing the whole thing back into an
    inlined primitive. ``shuffle()`` would do the same but draws a
    random per-analysis seed that gets inlined, defeating the purpose.
    Verified: new values trigger 0 new stage compiles vs 2 for
    ``F.lit`` (tests/test_crawl_parity.py::test_ref_lit_int)."""
    return F.element_at(F.lit([v]), (F.rand(42) * 0 + 1).cast("int"))


def decode_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched gzip decode + JSON parse + extraction.

    Emits extracted text, outlinks, a parse_ok flag and the
    byte-identity check of extracted text vs the page table's golden
    ``text`` column (input_hint invariant, surfaced as a metric).

    The golden text itself never crosses the Arrow boundary: the
    prepared page table carries ``text_md5`` (hex md5 of the golden's
    UTF-8 bytes, computed JVM-side once at prepare time) and the
    check compares md5(extracted bytes) against it — 32 bytes of
    ingress per row instead of the full golden body. At Common-Crawl
    page sizes (~50 KB of text) shipping the golden would roughly
    double python-worker ingress for a check that only produces one
    boolean. md5 equality == byte equality up to a 2^-64 collision;
    the parity suite additionally verifies TRUE byte identity with a
    JVM-side join at fixture scale (tests/test_crawl_parity.py)."""
    import hashlib

    for pdf in batches:
        texts, links, ok, match = [], [], [], []
        for html, golden_md5 in zip(pdf["html"], pdf["text_md5"]):
            if html is None:
                texts.append(None)
                links.append([])
                ok.append(False)
                match.append(False)
                continue
            try:
                # json.loads consumes the decompressed bytes directly —
                # the explicit .decode("utf-8") this replaces allocated
                # and scanned a second ~50 KB copy per page, pure
                # memory-bandwidth waste in the path that bounds the
                # crawl's measured scaling ceiling (decode probe 0.71).
                body = json.loads(gzip.decompress(bytes(html)))
                t = body.get("text")
                lk = body.get("links")
                texts.append(t)
                links.append(lk if isinstance(lk, list) else [])
                ok.append(True)
                match.append(
                    t is not None
                    and golden_md5 is not None
                    and hashlib.md5(t.encode("utf-8")).hexdigest() == golden_md5
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
    bloom_m_bits: int = 1 << 20
    bloom_k: int = 5
    use_bloom: bool = True
    # below this seen-set size the Bloom machinery costs more in job
    # launches than it saves in shuffle — use one exact join instead.
    # At 10^10 the threshold is crossed in the first batches and the
    # Bloom path (built lazily at the crossing) takes over.
    bloom_min_seen: int = 2_000_000
    # above this bound the bloom-survivor exact check switches from
    # broadcast joins to co-partitioned shuffle joins. The bound is
    # THIS batch's PRE-dedup outlink total (links_total), observed for
    # free on the results write — a provable (hence conservative) upper
    # bound on the survivor set, so a recrawl spike engages the shuffle
    # fallback in the spike batch itself. Because links_total
    # over-counts the true survivor set by the batch's link-duplication
    # factor (typically ~10-20×), the default is sized for the
    # pre-dedup metric: 16M raw links ≈ ≲2M distinct survivors ≈ a
    # ~16 MB hash-key broadcast — ordinary high-duplication batches
    # stay on the broadcast path, while tens of millions of maybe-seen
    # survivors at 10^10 scale still must never be broadcast.
    survivor_broadcast_limit: int = 16_000_000
    # secondary trigger (round-3 ADVICE): the 16M pre-dedup cap only
    # protects when the batch's link-duplication factor is ≥~8×. A
    # near-unique-outlink batch could put ~16M DISTINCT survivors on
    # the broadcast path, so the previous batch's measured duplication
    # factor (links_total/discovered, both already in the committed
    # metrics) scales links_total into an estimated distinct count,
    # and THAT is capped here. Estimate missing (resume from an older
    # state version) → only the provable links_total cap applies.
    # Both triggers are OR-ed: the switch can only engage the shuffle
    # path MORE often than the provable bound alone, never less.
    survivor_distinct_limit: int = 2_000_000
    # every K batches the seen delta is written as the COMPACTED full
    # union (table maintenance): the union read stays O(K) directories
    # instead of one per batch. Crash-safe: the compaction point is
    # recorded in the commit marker (seen_base); an uncommitted
    # compacted delta is simply overwritten on replay.
    compact_every: int = 8
    # -------- log-structured pending (Iceberg merge-on-read analogue)
    # A full pending rewrite per batch is O(frontier) I/O — at a
    # 10^10-URL frontier that dwarfs the batch itself. Instead each
    # batch appends only its NEW urls (pending_add/b{N}, the "data
    # files") and the fetched set doubles as equality-delete files:
    # the results parquet already persists the batch's url_hash
    # column, so delta mode writes ZERO extra delete state. The read
    # side is base ∪ adds(base..v] ANTI-JOIN fetched(base..v] — the
    # delete set is bounded by pending_delta_max_dels (below), so the
    # anti-join is always a broadcast (never a frontier shuffle).
    # Compaction (the full rewrite, = the old behavior) folds the
    # chain back into a new base when the delete set would exceed the
    # broadcast bound or the chain exceeds pending_compact_every dirs
    # — Iceberg's rewrite_data_files, driven by the same two
    # pressures (delete-file volume, manifest fan-out). Crash-safe:
    # pending_base/pending_dels live in the commit marker; an
    # uncommitted add/compaction is overwritten on replay.
    pending_compact_every: int = 8
    pending_delta_max_dels: int = 4_000_000
    # pipeline the previous batch's seen/bloom state writes (and its
    # commit marker) into the NEXT batch's select+parse window: those
    # writes are only read again by the next batch's DEDUP phase, so
    # deferring them hides their wall (plus one commit round) behind
    # the decode. Crash-safe: the commit marker is written only after
    # the deferred writes land, so a crash mid-overlap replays the
    # whole batch onto the same versioned paths (idempotent overwrite,
    # deterministic content — the existing kill/resume model).
    overlap_state_writes: bool = True
    # AQE partition coalescing targets bytes-per-partition and emits
    # awkward task counts (e.g. 19 tasks on 16 cores → a second wave
    # 19% full): measured avg busy cores matched ntasks/2 exactly on
    # the big crawl stages. The crawl's per-batch jobs keep the pinned
    # spark.sql.shuffle.partitions width (a multiple of the executor
    # count → full waves); AQE's join re-planning stays ON.
    disable_partition_coalescing: bool = True
    # Disable AQE entirely inside the crawl loop (restored on exit).
    # AQE materializes every exchange as its own job with a driver
    # re-plan between stages; the crawl's per-batch stages are
    # sub-second at bench scale, so those serial driver gaps dominate
    # the per-batch floor — measured r5 (local[16], 6 batches,
    # identical box window): jobs 102 → 46, zero-task driver wall
    # 83.6 s → 35.2 s, crawl wall −14%. The loop loses nothing AQE
    # provides: partition counts are pinned (coalescing was already
    # off), join strategies are chosen explicitly from provable
    # bounds (survivor_broadcast_limit / batch-hash broadcast), and
    # hot-host skew is handled by explicit salting
    # (politeness.select_batch). On a real cluster whose crawl
    # stages run minutes, re-enabling AQE is one constructor flag.
    disable_adaptive: bool = True
    # raw-string dedup BEFORE canonicalization (an extra groupBy
    # shuffle on the raw URL) pays off when the canonicalizer is
    # expensive relative to shuffling one batch's raw links; with the
    # r4 lambda-bound canonicalizer (~1.2 µs/URL) the trade is close —
    # False canonicalizes every raw occurrence (array_distinct still
    # collapses within-page repeats) and goes straight to ONE
    # canonical-level groupBy: one shuffle fewer per batch. Both paths
    # are exactly equivalent (min(depth) is associative); parity is
    # pinned by tests/test_crawl_parity.py.
    raw_prededup: bool = True
    # decode/parse width for SMALL batches (the single-partition-rank
    # path): width = clamp(est_rows / batch_rows_per_task, 1, cores).
    # Keeps per-task overhead amortized over at least this many pages;
    # the big-batch path is unaffected (already parallel).
    batch_rows_per_task: int = 8192
    _pages_prepared: DataFrame | None = field(default=None, repr=False)
    _min_cap: int | None = field(default=None, repr=False)
    _overlap: dict | None = field(default=None, repr=False)
    _pool: object | None = field(default=None, repr=False)
    _saved_conf: dict | None = field(default=None, repr=False)

    _COALESCE_KEY = "spark.sql.adaptive.coalescePartitions.enabled"
    _ADAPTIVE_KEY = "spark.sql.adaptive.enabled"
    _SHUFFLE_KEY = "spark.sql.shuffle.partitions"

    def _tune_shuffle_width(self, est: int | None) -> None:
        """Scale-adaptive shuffle width for the loop's per-batch jobs
        (guide §2: size partitions to the data, not the core count —
        AQE coalescing would do this, but AQE is off in the loop).
        The committed pending counter bounds every per-batch shuffle
        (links explode re-aggregates to ≤ discovered ≈ O(pending)),
        so width = clamp(est / batch_rows_per_task, 4, parallelism):
        a bench-scale batch shuffles in a handful of tasks (and writes
        that many state files) instead of a fixed 32, while big crawls
        keep full width. Partitioning never affects results (ranks and
        aggregates are pure functions of row values — the r5 parity
        suite runs at several widths)."""
        if est is None or os.environ.get("SPARK_GRAFT_CRAWL_WIDTH", "1") == "0":
            return
        par = self.spark.sparkContext.defaultParallelism
        width = min(par, max(4, est // self.batch_rows_per_task))
        self.spark.conf.set(self._SHUFFLE_KEY, str(width))

    def _enter_crawl_conf(self) -> None:
        if self._saved_conf is not None:
            return
        want = {}
        if self.disable_adaptive:
            want[self._ADAPTIVE_KEY] = "false"
        elif self.disable_partition_coalescing:
            want[self._COALESCE_KEY] = "false"
        saved = {}
        for k, v in want.items():
            saved[k] = self.spark.conf.get(k, "true")
            self.spark.conf.set(k, v)
        # _tune_shuffle_width adjusts this per batch; restore on exit
        saved[self._SHUFFLE_KEY] = self.spark.conf.get(self._SHUFFLE_KEY)
        self._saved_conf = saved

    def _exit_crawl_conf(self) -> None:
        """Restore the session's AQE confs — called from run()'s end
        and close(); interleaving run_batch() with other queries on
        the same session leaves them off until then (documented)."""
        if self._saved_conf is not None:
            for k, v in self._saved_conf.items():
                self.spark.conf.set(k, v)
            self._saved_conf = None

    def _ensure_pool(self):
        from concurrent.futures import ThreadPoolExecutor

        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=3)
        return self._pool

    def _flush_overlap(self) -> dict | None:
        """Complete the previous batch's deferred state writes, write
        its commit marker, release its cached frames. No-op when
        nothing is deferred. Engines abandoned mid-defer without a
        flush (or ``close``) simply lack the last commit marker —
        resume replays that batch; do not run a SECOND engine on the
        same state_dir in the same process while one holds deferred
        writes."""
        ov, self._overlap = self._overlap, None
        if ov is None:
            return None
        for fut in ov["futures"]:
            fut.result()  # surface write failures before committing
        self._commit(ov["batch_id"], ov["metrics"])
        for df in ov["release"]:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 - session may be stopping
                pass
        import gc as _gc

        _gc.collect()
        return ov["metrics"]

    def close(self) -> None:
        """Flush deferred state, restore session conf, stop the pool."""
        self._flush_overlap()
        self._exit_crawl_conf()
        if self._pool is not None:
            self._pool.shutdown(wait=True)
            self._pool = None

    def _politeness_min_cap(self) -> int:
        """Smallest per-host budget (politeness table ∪ default),
        collected ONCE (the table is dimension-sized — the reference's
        politeness analogue is a broadcast cache). Used to prove a
        batch's budgets cannot bind: min_cap ≥ pending rows ⇒ no host
        can exceed its cap ⇒ the per-host capping window (a hot-host
        single-task sort) is provably a no-op and is skipped."""
        if self._min_cap is None:
            vals = [int(r["max_per_batch"]) for r in self.politeness.collect()]
            self._min_cap = min([self.default_per_host, *vals])
        return self._min_cap

    # ------------------------------------------------------------ state io

    def _commit_dir(self) -> str:
        return os.path.join(self.state_dir, "_commits")

    def last_version(self) -> int:
        d = self._commit_dir()
        if not os.path.isdir(d):
            return -1
        vs = [int(f.split(".")[0]) for f in os.listdir(d) if f.endswith(".json")]
        return max(vs, default=-1)

    def _path(self, name: str, tag: str) -> str:
        return os.path.join(self.state_dir, name, tag)

    def _load_pending(self, version: int, commit: dict | None = None) -> DataFrame:
        """Merge-on-read view of the frontier at ``version``: the last
        compacted base, plus the add deltas after it, minus everything
        fetched since (the results parquet IS the equality-delete
        file — no separate delete state exists). The delete set is ≤
        ``pending_delta_max_dels`` by the writer's compaction invariant,
        so the anti-join broadcasts the deletes and never shuffles the
        frontier. Legacy commits (no ``pending_base``) read the full
        copy at ``version`` unchanged."""
        commit = commit if commit is not None else self._read_commit(version)
        base = int(commit.get("pending_base", version))
        df = self.spark.read.schema(PENDING_SCHEMA).parquet(self._path("pending", f"v{base}"))
        # Commit invariant: every batch in (base, version] ran without
        # compacting, and each such batch writes its pending_add/b{i}
        # synchronously BEFORE its commit marker — so a missing add
        # delta is lost state (bad vacuum, manual deletion), never a
        # legitimate gap. Fail loudly instead of silently dropping
        # frontier URLs.
        adds = []
        for i in range(base + 1, version + 1):
            p = self._path("pending_add", f"b{i}")
            if not os.path.isdir(p):
                raise FileNotFoundError(
                    f"frontier state corrupt: commit v{version} (pending_base="
                    f"{base}) references missing add delta {p}"
                )
            adds.append(p)
        if adds:
            df = df.unionByName(self.spark.read.schema(PENDING_SCHEMA).parquet(*adds))
        dels = [
            p
            for i in range(base + 1, version + 1)
            if os.path.isdir(p := os.path.join(self.state_dir, "results", f"batch={i}"))
        ]
        if dels:
            fetched = (
                self.spark.read.schema(RESULTS_SCHEMA).parquet(*dels).select("url_hash")
            )
            df = df.join(F.broadcast(fetched), "url_hash", "left_anti")
        return df

    def _load_seen_union(self, version: int, base: int = 0) -> DataFrame:
        """Union of seen deltas b{base}..b{version} — ``base`` comes
        from the commit's ``seen_base`` (the last compaction point),
        so a long crawl reads O(compact_every) directories, not one
        per batch."""
        paths = [self._path("seen", f"b{i}") for i in range(base, version + 1)]
        paths = [p for p in paths if os.path.isdir(p)]
        return self.spark.read.schema(SEEN_SCHEMA).parquet(*paths)

    def _load_bloom(self, version: int) -> DataFrame:
        return self.spark.read.schema(BLOOM_SCHEMA).parquet(self._path("bloom", f"v{version}"))

    def _ensure_bloom(self, version: int, seen_union: DataFrame) -> DataFrame:
        """Blobs for this version — built ONCE from the full seen union
        when the engine first crosses into bloom mode (earlier batches
        ran the exact-join path and kept no blobs)."""
        path = self._path("bloom", f"v{version}")
        if not os.path.isdir(path):
            merge_bloom_tables(
                None,
                seen_union,
                n_parts=self.bloom_parts,
                m_bits=self.bloom_m_bits,
                k=self.bloom_k,
            ).write.mode("overwrite").parquet(path)
        return self._load_bloom(version)

    def _read_commit(self, version: int) -> dict:
        path = os.path.join(self._commit_dir(), f"{version}.json")
        try:
            with open(path) as f:
                return json.load(f)
        except OSError:
            return {}

    def _commit(self, version: int, payload: dict) -> None:
        os.makedirs(self._commit_dir(), exist_ok=True)
        tmp = os.path.join(self._commit_dir(), f".{version}.json.tmp")
        final = os.path.join(self._commit_dir(), f"{version}.json")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.rename(tmp, final)  # atomic commit point
        self._vacuum(
            version,
            int(payload.get("seen_base", 0)),
            payload.get("pending_base"),
        )

    def _vacuum(self, version: int, seen_base: int, pending_base: int | None = None) -> None:
        """Expire-snapshots table maintenance: drop state versions no
        commit can reference anymore. Resume reads the LATEST commit
        (version v → pending base(v) + adds(base..v], bloom/v{v}, seen
        b{seen_base}..b{v}); recovery tolerance keeps one older commit
        readable, so the deletable set is everything below
        min(base(v), base(v−1)) for pending (full copies AND add
        deltas at or below a base are folded into it), bloom ≤ v−2,
        and seen deltas below the last compaction point — a crash at
        any point leaves the referenced set intact. Without this, a
        long crawl accumulates O(batches) full pending copies
        (Iceberg's expire_snapshots exists for the same reason)."""
        if pending_base is None:
            pending_base = version  # legacy commit: full copy at v
        prev = self._read_commit(version - 1)
        prev2 = self._read_commit(version - 2)
        prev_base = int(prev.get("pending_base", version - 1))
        keep_from = max(0, min(pending_base, prev_base))
        # Sweep from where the PREVIOUS vacuum's floor was, not a fixed
        # window below keep_from: a dels-triggered compaction can
        # advance the base by more than any fixed window in one step
        # (and pending_compact_every is configurable), which used to
        # leak the skipped pending/v{k} + pending_add/b{k} dirs
        # forever. floor(v-1) = min(base(v-1), base(v-2)); the extra
        # -16 margin re-covers a vacuum that crashed mid-sweep.
        prev2_base = int(prev2.get("pending_base", version - 2))
        prev_floor = max(0, min(prev_base, prev2_base))
        for k in range(max(0, prev_floor - 16), keep_from):
            for name in ("pending", "pending_add"):
                p = self._path(name, f"v{k}" if name == "pending" else f"b{k}")
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
        for k in range(max(0, version - 16), version - 1):
            p = self._path("bloom", f"v{k}")
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
        # Seen deltas advance by compact_every per compaction — also a
        # configurable jump, so sweep from the previous commit's base.
        prev_seen = int(prev.get("seen_base", 0))
        for k in range(max(0, prev_seen - 16), seen_base):
            p = self._path("seen", f"b{k}")
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)

    # ------------------------------------------------------------- seeding

    def init_from_seeds(self, seeds: DataFrame) -> None:
        """v0: pending = canonicalized seeds (priority from the seed
        list, depth 0); seen delta b0 = their hashes; bloom v0 over
        them. Duplicate seeds collapse to max priority.

        Robots-blocked seeds enter the SEEN set but not the pending
        queue (they can never be fetched; the oracle filters them at
        select time forever — observably identical, but this way the
        tracked pending count drains to exactly 0 at crawl end)."""
        if os.path.isdir(self.state_dir):
            shutil.rmtree(self.state_dir)
        canon = seeds.select(
            canonicalize_url("url").alias("url"), F.col("priority").cast("int").alias("priority")
        )
        all_seeds = (
            canon.groupBy("url")
            .agg(F.max("priority").alias("priority"))
            .select(
                "url",
                url_hash_canonical("url").alias("url_hash"),
                url_host("url").alias("host"),
                F.lit(0).cast("int").alias("depth"),
                "priority",
                F.lit(0).cast("int").alias("batch_enqueued"),
            )
        )
        pending = all_seeds if self.robots is None else robots_filter(all_seeds, self.robots)
        pending.write.mode("overwrite").parquet(self._path("pending", "v0"))
        all_seeds.select("url_hash").write.mode("overwrite").parquet(self._path("seen", "b0"))
        n_seen = self.spark.read.parquet(self._path("seen", "b0")).count()
        n_pending = self.spark.read.schema(PENDING_SCHEMA).parquet(
            self._path("pending", "v0")
        ).count()
        self._commit(
            0,
            {
                "batch": -1,
                "note": "seeded",
                "seen_rows": int(n_seen),
                "seen_base": 0,
                "pending_rows": int(n_pending),
                "pending_base": 0,
                "pending_dels": 0,
            },
        )

    # -------------------------------------------------------------- pages

    # bump when the prepared-table schema/derivation changes: a marker
    # with a different version is stale and forces a rebuild
    _PREP_VERSION = 3  # v3: ~128 MB-target file sizing on the prepared table

    def _pages_fingerprint(self) -> dict:
        """Content fingerprint of the source page table: data-file
        names + sizes + count (the same identity Iceberg snapshots
        carry as manifests). Regenerating the parquet in place changes
        file names/sizes, so a stale prepared table is detected and
        rebuilt instead of silently reused."""
        files = []
        for root, _, names in os.walk(self.pages_path):
            for n in sorted(names):
                if n.startswith(("_", ".")):
                    continue
                p = os.path.join(root, n)
                files.append((os.path.relpath(p, self.pages_path), os.path.getsize(p)))
        files.sort()
        import hashlib

        h = hashlib.md5(json.dumps(files).encode()).hexdigest()
        return {"version": self._PREP_VERSION, "n_files": len(files), "files_md5": h}

    def _pages(self) -> DataFrame:
        """The 'network': canonical_url → one deterministic snapshot.

        Canonicalization happens scan-side; duplicate snapshots (messy
        URL variants) resolve by min (warc_ts, html). Prepared ONCE to
        a scratch parquet (with the url_hash join key and the golden
        text's md5 for the byte-identity metric), NOT a heap cache —
        the corpus-sized table must never live deserialized in
        executor memory (at 100 TB it could not, and locally a 3M-row
        heap cache of html bytes measured as multi-GB GC churn).

        Staleness: the prepared table lives in a VERSIONED directory
        named by the source fingerprint (`…_prepared-<files_md5>`), so
        a source change publishes a NEW directory instead of deleting
        the one concurrent readers are mid-job on (round-3 ADVICE: the
        old rmtree-then-rename of a shared published path could fail a
        concurrent engine mid-read, and two builders racing the rmtree
        could hit FileNotFoundError). A `_prep_marker.json` inside
        still records the fingerprint as a completeness witness; the
        build goes to a unique temp dir and lands via atomic rename,
        and stale sibling versions are swept best-effort only AFTER
        the current version is published."""
        if self._pages_prepared is not None:
            return self._pages_prepared
        from pyspark.sql.window import Window

        # derived purely from the input table → lives NEXT TO it and is
        # reused across runs/engines (like a one-time table-format
        # conversion, not crawl work)
        fp = self._pages_fingerprint()
        base = self.pages_path.rstrip("/") + "_prepared"
        path = f"{base}-{fp['files_md5'][:16]}"
        marker = os.path.join(path, "_prep_marker.json")
        fresh = False
        if os.path.isdir(path) and os.path.isfile(marker):
            try:
                with open(marker) as f:
                    fresh = json.load(f) == fp
            except (OSError, ValueError):
                fresh = False
        if not fresh:
            # UNIQUE temp dir per builder: two engines racing on the
            # same pages_path each build privately; the loser of the
            # publish rename just discards its build (the winner's
            # content is identical — same deterministic derivation)
            import tempfile as _tempfile

            tmp = _tempfile.mkdtemp(
                prefix=os.path.basename(path) + ".build-",
                dir=os.path.dirname(path) or ".",
            )
            os.rmdir(tmp)  # Spark's writer wants to create it itself
            raw = self.spark.read.parquet(self.pages_path)
            keyed = raw.select(
                canonicalize_url("url").alias("canonical_url"),
                "warc_ts",
                "html",
                F.col("text").alias("text_golden"),
                "lang",
            )
            w = Window.partitionBy("canonical_url").orderBy("warc_ts", "html")
            prepared = (
                keyed.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn", "warc_ts")
                .withColumn("url_hash", portable_hash64(F.col("canonical_url")))
                .withColumn("text_md5", F.md5(F.col("text_golden").cast("binary")))
            )
            # Output file sizing (guide §6): the write otherwise lands at
            # the session's shuffle width (32 tiny files at bench scale —
            # AQE is off inside the loop, where the first build usually
            # happens), and EVERY batch's semi-join re-scans this table,
            # paying per-file open/listing each time. Target ~128 MB
            # files from the source's known byte size (the fingerprint
            # already carries it); parallelism of the scan at real scale
            # comes from maxPartitionBytes splits, not file count.
            src_bytes = sum(
                os.path.getsize(os.path.join(r, n))
                for r, _, ns in os.walk(self.pages_path)
                for n in ns
                if not n.startswith(("_", "."))
            )
            n_files = min(
                self.spark.sparkContext.defaultParallelism,
                max(1, src_bytes // (128 << 20) + 1),
            )
            prepared.coalesce(int(n_files)).write.mode("overwrite").parquet(tmp)
            with open(os.path.join(tmp, "_prep_marker.json"), "w") as f:
                json.dump(fp, f)
            # a half-published dir at the versioned path can only be a
            # crashed rename's debris (rename is atomic; a COMPLETE dir
            # has the marker and would have read fresh above)
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            try:
                os.rename(tmp, path)  # atomic publish
            except OSError:
                # a concurrent builder published first; its content is
                # byte-identical (deterministic derivation) — keep it
                shutil.rmtree(tmp, ignore_errors=True)
                if not os.path.isdir(path):
                    raise
            # sweep stale versions AFTER publish (best-effort: another
            # engine may be sweeping too, or still reading a stale
            # version mid-job — its files stay open on POSIX; it
            # re-resolves the current version on its next _pages())
            parent = os.path.dirname(path) or "."
            prefix = os.path.basename(base)
            for n in os.listdir(parent):
                cand = os.path.join(parent, n)
                if (
                    (n == prefix or n.startswith(prefix + "-"))
                    and ".build-" not in n  # a concurrent builder's live temp
                    and cand != path
                    and os.path.isdir(cand)
                ):
                    shutil.rmtree(cand, ignore_errors=True)
        self._pages_prepared = self.spark.read.parquet(path)
        return self._pages_prepared

    # ---------------------------------------------------------- one batch

    def run_batch(self, defer_state: bool = False) -> dict:
        """Run one micro-batch; returns its metric dict.

        The committed ``pending_rows`` counter (prev − fetched + kept)
        detects a drained frontier with ZERO Spark jobs, and every
        per-batch metric is an aggregation folded into the single
        concurrent commit wave — there is no serial driver round-trip
        left in the loop (the round-trips were the measured per-batch
        scaling floor; see BENCH/BASELINE.md §2.2).

        ``defer_state=False`` (default): durable on return — state
        writes and the commit marker land before the call returns.
        ``defer_state=True`` (what ``run()`` passes): the seen/bloom
        writes + commit are deferred into the NEXT batch's parse
        window (``overlap_state_writes``); the caller owns flushing
        via another run_batch / run() end / accessors / close()."""
        import time as _time

        _debug = os.environ.get("SPARK_GRAFT_CRAWL_DEBUG") == "1"
        _t0 = _time.time()
        _marks: list[tuple[str, float]] = []

        def _mark(label: str) -> None:
            if _debug:
                _marks.append((label, _time.time()))

        self._enter_crawl_conf()
        if self._overlap is not None:
            # previous batch's seen/bloom writes are still in flight —
            # its metrics ARE the durable-to-be state; select+parse of
            # this batch needs none of the deferred files
            v = int(self._overlap["batch_id"])
            prev = dict(self._overlap["metrics"])
        else:
            v = self.last_version()
            prev = self._read_commit(v)
        batch_id = v + 1
        if prev.get("pending_rows") == 0:
            self._flush_overlap()
            return {"batch": batch_id, "fetched": 0, "done": True}
        pending = self._load_pending(v, prev)

        pending_prev = prev.get("pending_rows")
        # Intermediate-sharing strategy (each choice measured — see
        # BENCH/BASELINE.md):
        #  - the global rank inside select_batch uses static url_hash
        #    buckets (politeness.add_global_seq): a pure function of
        #    row values, so no boundary sampling, no checkpoint, no
        #    order-sensitivity — two jobs fewer per batch than the
        #    previous repartitionByRange design.
        #  - the decoded batch is materialized BY THE RESULTS WRITE
        #    itself (phase 1): the parquet file then backs every other
        #    consumer via a column-pruned re-read (the dedup branch
        #    reads only `links`+`depth`). Holding the decoded text in a
        #    deserialized executor cache instead measured multi-GB heap
        #    + GC churn at million-row batches. Parse metrics ride the
        #    write via ``Observation`` — exactly ONE action runs on
        #    that plan, so the observed counters are complete.
        #  - `marked` (dedup output; small columns) uses persist() +
        #    explicit unpersist, materialized by exactly one job — the
        #    pending write (phase 2), whose CollectMetrics node also
        #    supplies the dedup counters — before the remaining write
        #    fan-out (concurrent jobs racing on an unmaterialized cache
        #    re-execute the subtree below the cache point — ~3× waste).
        est = int(pending_prev) if pending_prev is not None else None
        self._tune_shuffle_width(est)
        batch = select_batch(
            pending,
            self.politeness,
            self.robots,
            batch_cap=self.batch_cap,
            default_per_host=self.default_per_host,
            est_rows=est,
            skip_caps=est is not None and self._politeness_min_cap() >= est,
        ).select("seq", "url", "url_hash", "host", "depth", "priority")
        if (
            est is not None
            and est <= SMALL_BATCH_ROWS
            and os.environ.get("SPARK_GRAFT_BATCH_REPART", "1") != "0"
        ):
            # The small-batch rank is a single-partition window; left
            # alone, EVERYTHING downstream of it stays one partition —
            # fetch join, gzip decode, parse, the results file, and the
            # next scan of that one file (link explode + map-side
            # dedup) all ran in ONE task (r6 finding: results/batch=N
            # held a single parquet file). Restore decode/parse width
            # with one deterministic hash repartition — but SIZE it to
            # the batch (guide §2: scale-adaptive partitioning, not the
            # core count): a full-width fan-out of a few-thousand-row
            # batch costs more in python-worker round-trips, tiny-file
            # commits and extra-stage scheduling than it buys
            # (interleaved A/B at bench scale: min 9.8 s serial vs
            # 13.7 s at width 32). `seq` is already a column, so
            # ordering semantics are untouched; the big-batch path
            # keeps its parallelism from add_global_seq's group
            # windows and never takes this exchange.
            width = min(
                self.spark.sparkContext.defaultParallelism,
                max(1, est // self.batch_rows_per_task),
            )
            if width > 1:
                batch = batch.repartition(width, "url_hash")
        batch = batch.persist()
        _mark("select_build")

        # fetch + decode + parse. The batch's url-hash SET is broadcast
        # (8 bytes/URL) into a semi-join that prefilters the corpus
        # scan, so only HIT rows (≤ batch size) ever shuffle — without
        # it the full pages table (the 100-TB analogue) would shuffle
        # through the join EVERY batch. The exact left join then runs
        # on two batch-sized sides. Only (html, text_md5, lang) cross
        # into python — never the golden text body (see
        # decode_and_parse).
        hits = self._pages().join(
            F.broadcast(batch.select("url_hash")), "url_hash", "left_semi"
        ).drop("url_hash")
        fetched = batch.join(hits, batch.url == F.col("canonical_url"), "left").select(
            "seq", "url", "url_hash", "host", "depth", "html", "text_md5", "lang"
        )
        parsed = fetched.mapInPandas(decode_and_parse, schema=PARSE_SCHEMA)

        from pyspark.sql import Observation

        obs = Observation()
        results = parsed.select(
            "seq",
            "url",
            "url_hash",
            "host",
            "depth",
            "text",
            "lang",
            "links",
            F.size("links").alias("n_links"),
            "parse_ok",
            "text_match",
            _ref_lit_int(batch_id).cast("int").alias("batch_id"),
        ).observe(
            obs,
            F.count(F.lit(1)).alias("fetched"),
            F.sum(F.col("parse_ok").cast("int")).alias("parsed_ok"),
            F.sum(F.col("text_match").cast("int")).alias("text_match"),
            # exact pre-dedup outlink count of THIS batch — a provable
            # upper bound on the discovered/survivor set size, used to
            # pick the survivor-join strategy for the CURRENT batch
            # (a recrawl spike switches to shuffle in the spike batch
            # itself, not one batch late)
            F.sum(F.greatest(F.col("n_links"), F.lit(0))).alias("links_total"),
        )
        results_path = os.path.join(self.state_dir, "results", f"batch={batch_id}")

        def timed(fn):
            if not _debug:
                return fn

            def wrapper():
                t = _time.time()
                out = fn()
                print(f"  [batch {batch_id}] {fn.__name__}: {_time.time() - t:.2f}s", flush=True)
                return out

            return wrapper

        # ---- phase 1: decode once, straight into the results sink
        def j_parse_write():
            results.write.mode("overwrite").parquet(results_path)

        _mark("parse_build")
        timed(j_parse_write)()
        _mark("parse_job")
        m_parse = obs.get
        # the previous batch's deferred seen/bloom writes ran BEHIND the
        # parse job above; the dedup phase below reads them — flush now
        # (completes the writes, lands the commit marker)
        timed(self._flush_overlap)()
        n_fetched = int(m_parse["fetched"])
        parsed_ok = int(m_parse["parsed_ok"] or 0)
        text_match = int(m_parse["text_match"] or 0)
        links_total = int(m_parse["links_total"] or 0)
        if n_fetched == 0:
            # nothing eligible (e.g. legacy state with robots-blocked
            # pending rows): no state advanced, leave the last commit
            batch.unpersist()
            return {"batch": batch_id, "fetched": 0, "done": True}

        res = self.spark.read.schema(RESULTS_SCHEMA).parquet(results_path)

        # discover links → canonical → dedup (bloom prefilter + exact).
        # Robots-blocked discoveries enter SEEN (never re-considered)
        # but not PENDING (they can never be fetched) — observably
        # identical to filtering at select time, and it keeps the
        # pending_rows counter exact.
        # RAW-string dedup BEFORE canonicalization (raw_prededup=True):
        # outlinks repeat heavily within a batch (popular pages are
        # linked from many fetched pages), so collapsing duplicates
        # first (string-equality hash-agg with map-side combine) cuts
        # the regex work by the batch's link-duplication factor — at
        # the cost of a second shuffle on the raw strings. With
        # raw_prededup=False the canonicalizer runs on every raw
        # occurrence and the dedup is ONE canonical-level groupBy.
        # min(depth) is associative, so both orders are exactly
        # equivalent (parity: tests/test_crawl_parity.py).
        exploded = res.select(
            F.explode("links").alias("raw_url"), F.col("depth").alias("pdepth")
        )
        if self.raw_prededup:
            exploded = exploded.groupBy("raw_url").agg(F.min("pdepth").alias("pdepth"))
        discovered = (
            exploded.select(
                canonicalize_url("raw_url").alias("url"),
                (F.col("pdepth") + 1).cast("int").alias("depth"),
            )
            .groupBy("url")
            .agg(F.min("depth").alias("depth"))
            .select(
                "url",
                url_hash_canonical("url").alias("url_hash"),
                url_host("url").alias("host"),
                F.col("depth"),
                F.lit(0).cast("int").alias("priority"),
            )
        )
        if self.robots is not None:
            discovered = with_robots_blocked(discovered, self.robots, "__blocked")
        else:
            discovered = discovered.withColumn("__blocked", F.lit(False))

        seen_base = int(prev.get("seen_base", 0))
        seen_union = self._load_seen_union(v, seen_base)
        do_compact = (batch_id - seen_base) >= self.compact_every
        seen_rows = int(prev.get("seen_rows", 0))
        bloom_mode = self.use_bloom and seen_rows >= self.bloom_min_seen
        if bloom_mode:
            bloom = self._ensure_bloom(v, seen_union).cache()
            # survivor-set size this batch is provably ≤ links_total —
            # THIS batch's pre-dedup outlink count, observed for free
            # on the results write. Broadcast when the bound is small;
            # co-partitioned shuffle when a recrawl-heavy batch could
            # OOM the broadcast (the switch engages in the spike batch
            # itself — the bound is current, not last batch's count).
            # Secondary distinct-estimate trigger: see
            # survivor_distinct_limit.
            prev_links = int(prev.get("links_total", 0) or 0)
            prev_disc = int(prev.get("discovered", 0) or 0)
            est_distinct = (
                links_total * prev_disc / prev_links if prev_links > 0 and prev_disc > 0
                else None
            )
            survivor_join = (
                "shuffle"
                if links_total > self.survivor_broadcast_limit
                or (est_distinct is not None and est_distinct > self.survivor_distinct_limit)
                else "broadcast"
            )
            marked = mark_new_against_seen(
                discovered,
                seen_union,
                bloom,
                n_parts=self.bloom_parts,
                survivor_join=survivor_join,
            ).persist()
        else:
            # small seen set: ONE co-partitioned join beats the Bloom
            # machinery's serial broadcast/python job launches
            bloom = None
            marked = (
                discovered.join(
                    seen_union.withColumn("__m", F.lit(1)), "url_hash", "left"
                )
                .withColumn("is_new", F.col("__m").isNull())
                .drop("__m")
            ).persist()
        # dedup metrics ride the FIRST job that materializes `marked`
        # (the pending write) as an Observation — the collect round-trip
        # this replaces was part of the measured per-batch serial floor.
        # The CollectMetrics node sits between the cache and the filters,
        # so every marked row flows through it exactly once per job; the
        # first completed job (j_pending, which phase 2 runs alone
        # alongside the independent metrics write) supplies the values.
        obs_dedup = Observation()
        marked_obs = marked.observe(
            obs_dedup,
            F.count(F.lit(1)).alias("nd"),
            F.sum(F.col("is_new").cast("int")).alias("nn"),
            F.sum((F.col("is_new") & ~F.col("__blocked")).cast("int")).alias("kept"),
        )
        enqueue_cols = [
            F.col("url"),
            F.col("url_hash"),
            F.col("host"),
            F.col("depth"),
            F.col("priority"),
            _ref_lit_int(batch_id).cast("int").alias("batch_enqueued"),
        ]
        # j_seen/j_bloom read plain `marked` (no CollectMetrics in their
        # plans), so the observation fires exactly once — in j_pending.
        new_urls = marked.where("is_new").select(*enqueue_cols)
        new_pending = marked_obs.where(F.col("is_new") & ~F.col("__blocked")).select(
            *enqueue_cols
        )
        # pending shrinks by the batch, grows by the new fetchable
        # urls. Delta mode (the merge-on-read default) appends ONLY
        # the new urls — the just-written results parquet is the
        # equality-delete file for the fetched set, so the write is
        # O(new), not O(frontier). Compaction folds the chain into a
        # fresh base when the accumulated delete set would outgrow the
        # read side's broadcast bound or the chain gets too long.
        pending_base_prev = int(prev.get("pending_base", v))
        dels_after = int(prev.get("pending_dels", 0) or 0) + n_fetched
        compact_pending = (
            dels_after > self.pending_delta_max_dels
            or (batch_id - pending_base_prev) >= self.pending_compact_every
        )
        if compact_pending:
            next_pending = pending.join(
                batch.select("url_hash"), "url_hash", "left_anti"
            ).unionByName(new_pending)
        else:
            next_pending = new_pending

        def j_pending():
            path = (
                self._path("pending", f"v{batch_id}")
                if compact_pending
                else self._path("pending_add", f"b{batch_id}")
            )
            next_pending.write.mode("overwrite").parquet(path)

        def j_seen():
            delta = new_urls.select("url_hash")
            if do_compact:
                # table maintenance: fold the whole union into this
                # batch's file so future reads start here
                delta = seen_union.unionByName(delta)
            delta.write.mode("overwrite").parquet(self._path("seen", f"b{batch_id}"))

        def j_bloom():
            if bloom_mode:
                merge_bloom_tables(
                    bloom,
                    new_urls.select("url_hash"),
                    n_parts=self.bloom_parts,
                    m_bits=self.bloom_m_bits,
                    k=self.bloom_k,
                ).write.mode("overwrite").parquet(self._path("bloom", f"v{batch_id}"))

        # ---- phase 2: the pending write MATERIALIZES `marked` (and its
        # CollectMetrics node supplies the dedup counters — the serial
        # collect round-trip this replaces was part of the measured
        # per-batch floor). It runs ALONE: it is the only write the
        # next batch's select phase reads. j_seen/j_bloom wait so they
        # hit a materialized cache instead of racing to re-execute the
        # dedup subtree (~3× waste, measured). Per-partition lineage is
        # merge-on-read (metrics_table), not a per-batch write.
        _mark("dedup_build")
        timed(j_pending)()
        _mark("pending_job")
        m_dedup = obs_dedup.get
        n_discovered = int(m_dedup["nd"])
        n_new = int(m_dedup["nn"] or 0)
        n_kept = int(m_dedup["kept"] or 0)
        pending_rows = (
            int(pending_prev) - n_fetched + n_kept if pending_prev is not None else None
        )
        metrics = {
            "batch": batch_id,
            "fetched": n_fetched,
            "parsed_ok": parsed_ok,
            "text_match": text_match,
            "discovered": int(n_discovered),
            "links_total": int(links_total),
            "new_urls": int(n_new),
            "deduped": int(n_discovered - n_new),
            "seen_rows": seen_rows + int(n_new),
            "seen_base": batch_id if do_compact else seen_base,
            "pending_rows": pending_rows,
            "pending_base": batch_id if compact_pending else pending_base_prev,
            "pending_dels": 0 if compact_pending else dels_after,
            "bloom_mode": bloom_mode,
            "done": pending_rows == 0,
        }
        batch.unpersist()
        # ---- phase 3: seen/bloom state writes. The loop itself never
        # reads them again this batch (they feed the NEXT batch's
        # dedup phase), so by default they are deferred into the next
        # batch's select+parse window (overlap_state_writes); the
        # final batch (and overlap-off mode) completes them
        # synchronously, and every accessor flushes first.
        futures = [
            self._ensure_pool().submit(timed(j)) for j in (j_seen, j_bloom)
        ]
        release = [marked] + ([bloom] if bloom is not None else [])
        self._overlap = {
            "batch_id": batch_id,
            "metrics": metrics,
            "futures": futures,
            "release": release,
        }
        # run_batch() alone is durable-on-return (kill/resume contract);
        # only run()'s managed loop opts into cross-batch deferral
        if not (self.overlap_state_writes and defer_state) or metrics["done"]:
            self._flush_overlap()
        if _debug:
            _mark("tail")
            spans = []
            prev_t = _t0
            for label, t in _marks:
                spans.append(f"{label}={t - prev_t:.2f}")
                prev_t = t
            print(
                f"[batch {batch_id}] fetched={n_fetched} wall={_time.time() - _t0:.1f}s "
                + " ".join(spans),
                flush=True,
            )
        return metrics

    def _partition_metrics(self, parsed: DataFrame) -> DataFrame:
        """Per-partition lineage: which scan partition holds how many
        fetches/parses per batch (north rule 'per-partition lineage
        and fetch/dedup/parse metrics'). Computed MERGE-ON-READ from
        the durable results parquet — the per-batch eager write this
        replaces was one extra action plus a full results re-scan in
        every batch's deferred-write window (measured part of the
        per-batch job floor), for a table nothing in the loop reads."""
        return (
            parsed.withColumn("partition_id", F.spark_partition_id())
            .groupBy("batch_id", "partition_id")
            .agg(
                F.count("*").alias("fetched"),
                F.sum(F.col("parse_ok").cast("int")).alias("parsed_ok"),
                F.sum(F.col("text_match").cast("int")).alias("text_match"),
                F.min("url_hash").alias("min_url_hash"),
                F.max("url_hash").alias("max_url_hash"),
            )
        )

    # ------------------------------------------------------------ the loop

    def run(self, max_batches: int = 1000) -> list[dict]:
        """Crawl until the frontier drains or max_batches."""
        out = []
        try:
            for _ in range(max_batches):
                m = self.run_batch(defer_state=True)
                out.append(m)
                if m.get("done") or m.get("fetched", 0) == 0:
                    break
        finally:
            # a failed batch must not leave deferred writes dangling or
            # the session's coalescing conf flipped for other queries
            try:
                self._flush_overlap()  # max_batches may stop mid-overlap
            finally:
                self._exit_crawl_conf()
        return out

    # ----------------------------------------------------------- accessors
    # (each flushes deferred state first, so readers always see a
    # committed, fully-written store)

    def results(self) -> DataFrame:
        self._flush_overlap()
        return self.spark.read.option("basePath", os.path.join(self.state_dir, "results")).parquet(
            os.path.join(self.state_dir, "results", "batch=*")
        )

    def metrics_table(self) -> DataFrame:
        """Per-(batch, scan-partition) lineage, computed on demand from
        the results store (see :meth:`_partition_metrics`)."""
        return self._partition_metrics(self.results())

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
        self._flush_overlap()
        v = self.last_version()
        base = int(self._read_commit(v).get("seen_base", 0))
        return {r["url_hash"] for r in self._load_seen_union(v, base).collect()}
