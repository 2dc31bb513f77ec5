"""Crawl-parity tests (north rule / FIXTURES.md F7).

Same seed list + politeness budget: the Spark CrawlEngine must
reproduce the sequential Python oracle's crawl ORDER, final SEEN
set, per-batch metrics, and byte-identical extracted text per url.
Also: kill-after-batch-k resume ≡ uninterrupted run.
"""

from __future__ import annotations

import shutil

import pytest

from openalex_collaboration_crawler_spark.sources.pages import (
    build_pages,
    build_politeness,
    build_robots,
    build_seeds,
)
from openalex_collaboration_crawler_spark.streaming.frontier import CrawlEngine
from tests.oracle.crawler_oracle import OracleCrawler

N_PAGES = 300


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("crawl")
    pages_path = str(root / "pages")
    build_pages(spark, n_pages=N_PAGES).write.mode("overwrite").parquet(pages_path)
    politeness = build_politeness(spark, default_per_batch=6, hot_per_batch=3)
    robots = build_robots(spark)
    seeds = build_seeds(spark, n_pages=N_PAGES, n_seeds=5)
    return {
        "root": root,
        "pages_path": pages_path,
        "politeness": politeness,
        "robots": robots,
        "seeds": seeds,
    }


def _mk_engine(spark, world, name: str, **kw) -> CrawlEngine:
    return CrawlEngine(
        spark=spark,
        state_dir=str(world["root"] / name),
        pages_path=world["pages_path"],
        politeness=world["politeness"],
        robots=world["robots"],
        default_per_host=6,
        bloom_parts=4,
        **kw,
    )


def _mk_oracle(spark, world) -> OracleCrawler:
    page_rows = [r.asDict() for r in spark.read.parquet(world["pages_path"]).collect()]
    politeness_rows = [r.asDict() for r in world["politeness"].collect()]
    robots_rows = [r.asDict() for r in world["robots"].collect()]
    orc = OracleCrawler.from_rows(
        page_rows, politeness_rows, robots_rows, default_per_host=6
    )
    orc.seed([(r["url"], r["priority"]) for r in world["seeds"].collect()])
    return orc


@pytest.fixture(scope="module")
def oracle_run(spark, world):
    orc = _mk_oracle(spark, world)
    orc.run(max_batches=50)
    return orc


@pytest.fixture(scope="module")
def engine_run(spark, world):
    eng = _mk_engine(spark, world, "engine_full")
    eng.init_from_seeds(world["seeds"])
    metrics = eng.run(max_batches=50)
    return eng, metrics


def test_crawl_order_parity(engine_run, oracle_run):
    eng, _ = engine_run
    assert eng.crawl_order() == oracle_run.order


def test_seen_set_parity(engine_run, oracle_run):
    eng, _ = engine_run
    assert eng.seen_hashes() == oracle_run.seen


def test_metrics_parity(engine_run, oracle_run):
    _, metrics = engine_run
    got = [
        {k: m[k] for k in ("fetched", "parsed_ok", "text_match", "discovered", "new_urls", "deduped")}
        for m in metrics
        if m.get("fetched", 0) > 0
    ]
    want = [
        {k: m[k] for k in ("fetched", "parsed_ok", "text_match", "discovered", "new_urls", "deduped")}
        for m in oracle_run.metrics
    ]
    assert got == want


def test_text_byte_identity(engine_run, spark, world):
    """input_hint invariant: extracted text byte-identical per url.

    Two layers: (a) the engine's own per-row text_match metric (an
    md5 comparison against the prepared table's text_md5 — the hot
    path never ships the golden body); (b) a TRUE byte-identity check
    done here with a JVM-side join against the golden text itself, so
    a bug in the md5 plumbing (wrong column, wrong encoding, trivially
    true flag) cannot hide behind layer (a)."""
    from pyspark.sql import functions as F

    eng, metrics = engine_run
    res = eng.results()
    n = res.count()
    n_match = res.where("text_match").count()
    n_found = res.where("parse_ok").count()
    assert n_found == n_match  # every parsed page matched its golden md5
    assert n > 0

    # layer (b): independent golden join — raw pages table, canonical
    # dedup re-derived here, text compared as BYTES, not hashes
    from openalex_collaboration_crawler_spark.functions.url import canonicalize_url
    from pyspark.sql.window import Window

    raw = spark.read.parquet(world["pages_path"]).select(
        canonicalize_url("url").alias("curl"), "warc_ts", "html", F.col("text").alias("golden")
    )
    w = Window.partitionBy("curl").orderBy("warc_ts", "html")
    golden = (
        raw.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
        .select("curl", "golden")
    )
    joined = res.where("parse_ok").join(golden, res.url == F.col("curl"), "left")
    n_joined = joined.count()
    n_byte_equal = joined.where(
        F.col("golden").isNotNull()
        & (F.col("text").cast("binary") == F.col("golden").cast("binary"))
    ).count()
    assert n_joined == n_found
    assert n_byte_equal == n_found  # TRUE byte identity for every parsed row


def test_resume_equals_uninterrupted(spark, world, engine_run, oracle_run):
    """Kill after 2 batches; a fresh engine object resumes from the
    commit log and finishes identically (idempotent MERGE semantics)."""
    eng1 = _mk_engine(spark, world, "engine_resume")
    eng1.init_from_seeds(world["seeds"])
    for _ in range(2):
        eng1.run_batch()
    # simulate crash: drop the object, start over from disk
    eng2 = _mk_engine(spark, world, "engine_resume")
    assert eng2.last_version() == 2
    eng2.run(max_batches=50)
    assert eng2.crawl_order() == oracle_run.order
    assert eng2.seen_hashes() == oracle_run.seen


def test_bloom_off_same_result(spark, world, oracle_run):
    """The Bloom prefilter is a pure optimization — disabling it must
    not change any observable output."""
    eng = _mk_engine(spark, world, "engine_nobloom", use_bloom=False)
    eng.init_from_seeds(world["seeds"])
    eng.run(max_batches=50)
    assert eng.crawl_order() == oracle_run.order
    assert eng.seen_hashes() == oracle_run.seen


def test_bloom_forced_same_result(spark, world, oracle_run):
    """Force the Bloom path from batch 1 (bloom_min_seen=0) — the
    adaptive dedup strategy must be output-invariant."""
    eng = _mk_engine(spark, world, "engine_bloom_forced", bloom_min_seen=0)
    eng.init_from_seeds(world["seeds"])
    metrics = eng.run(max_batches=50)
    assert any(m.get("bloom_mode") for m in metrics if m.get("fetched"))
    assert eng.crawl_order() == oracle_run.order
    assert eng.seen_hashes() == oracle_run.seen


def test_range_rank_path_same_result(spark, world, oracle_run, monkeypatch):
    """Force the two-phase parallel range rank (the 10^10-scale path;
    small batches normally take the single-partition window) through
    the whole crawl loop — the ranking strategy must be
    output-invariant at any batch size."""
    from openalex_collaboration_crawler_spark.streaming import politeness as pol

    monkeypatch.setattr(pol, "SMALL_BATCH_ROWS", -1)
    eng = _mk_engine(spark, world, "engine_rangerank")
    eng.init_from_seeds(world["seeds"])
    eng.run(max_batches=50)
    assert eng.crawl_order() == oracle_run.order
    assert eng.seen_hashes() == oracle_run.seen


def test_survivor_shuffle_join_same_result(spark, world, oracle_run):
    """Force the shuffle fallback for the bloom-survivor exact check
    (survivor_broadcast_limit=0 + bloom from batch 1) — the scale-safe
    join strategy must be output-invariant."""
    eng = _mk_engine(
        spark, world, "engine_shuffle_surv", bloom_min_seen=0, survivor_broadcast_limit=0
    )
    eng.init_from_seeds(world["seeds"])
    metrics = eng.run(max_batches=50)
    assert any(m.get("bloom_mode") for m in metrics if m.get("fetched"))
    assert eng.crawl_order() == oracle_run.order
    assert eng.seen_hashes() == oracle_run.seen


def test_unbounded_budget_skip_path(spark, world):
    """With budgets provably non-binding the engine skips the per-host
    capping window (the hot-host serial sort); the oracle still runs
    its caps — results must be identical because the caps can't bind."""
    big = (1 << 31) - 1
    politeness = build_politeness(spark, default_per_batch=big, hot_per_batch=big)
    eng = CrawlEngine(
        spark=spark,
        state_dir=str(world["root"] / "engine_nocap"),
        pages_path=world["pages_path"],
        politeness=politeness,
        robots=world["robots"],
        default_per_host=big,
        bloom_parts=4,
    )
    eng.init_from_seeds(world["seeds"])
    eng.run(max_batches=50)
    orc = OracleCrawler.from_rows(
        [r.asDict() for r in spark.read.parquet(world["pages_path"]).collect()],
        [r.asDict() for r in politeness.collect()],
        [r.asDict() for r in world["robots"].collect()],
        default_per_host=big,
    )
    orc.seed([(r["url"], r["priority"]) for r in world["seeds"].collect()])
    orc.run(max_batches=50)
    assert eng.crawl_order() == orc.order
    assert eng.seen_hashes() == orc.seen


def test_seen_compaction_same_result(spark, world, oracle_run):
    """Aggressive compaction (every 3 batches) must be output-invariant
    and must actually advance the compaction point."""
    eng = _mk_engine(spark, world, "engine_compact", compact_every=3)
    eng.init_from_seeds(world["seeds"])
    for _ in range(5):  # past the first compaction point...
        eng.run_batch()
    assert int(eng._read_commit(5).get("seen_base", 0)) > 0
    eng2 = _mk_engine(spark, world, "engine_compact", compact_every=3)
    eng2.run(max_batches=50)  # ...then resume ACROSS it from disk
    v = eng2.last_version()
    base = int(eng2._read_commit(v).get("seen_base", 0))
    assert base >= v - 3  # union reads stay O(compact_every) dirs
    assert eng2.crawl_order() == oracle_run.order
    assert eng2.seen_hashes() == oracle_run.seen


def test_robots_blocked_never_fetched(engine_run, spark):
    eng, _ = engine_run
    fetched_urls = [r["url"] for r in eng.results().select("url").collect()]
    assert all(not u.startswith("http://host1.example.org/page/1") for u in fetched_urls)
    # host1's other pages (not /page/1*) are still crawlable
    assert any(u.startswith("http://host1.example.org/") for u in fetched_urls)


def test_pending_delta_aggressive_compaction(spark, world, oracle_run):
    """Merge-on-read pending with a tiny compaction cadence (every 2
    batches) — the delta-chain/compaction cycling must be
    output-invariant, the base must actually advance, and a resume
    must land mid-chain and finish identically."""
    eng = _mk_engine(spark, world, "engine_pending_mor", pending_compact_every=2)
    eng.init_from_seeds(world["seeds"])
    for _ in range(5):
        eng.run_batch()
    c5 = eng._read_commit(5)
    assert int(c5.get("pending_base", -1)) >= 2  # compaction advanced the base
    eng2 = _mk_engine(spark, world, "engine_pending_mor", pending_compact_every=2)
    eng2.run(max_batches=50)  # resume from disk across the chain
    assert eng2.crawl_order() == oracle_run.order
    assert eng2.seen_hashes() == oracle_run.seen


def test_pending_compact_every_batch_same_result(spark, world, oracle_run):
    """pending_delta_max_dels=0 forces compaction (the full rewrite,
    i.e. the pre-MoR behavior) on every batch — both write modes must
    be observably identical."""
    eng = _mk_engine(
        spark, world, "engine_pending_full", pending_delta_max_dels=0
    )
    eng.init_from_seeds(world["seeds"])
    metrics = eng.run(max_batches=50)
    assert all(
        m.get("pending_dels", 0) == 0 for m in metrics if m.get("fetched")
    )  # every batch compacted
    assert eng.crawl_order() == oracle_run.order
    assert eng.seen_hashes() == oracle_run.seen


def test_pending_delta_never_compacts_same_result(spark, world, oracle_run):
    """A huge cadence + delete bound keeps the whole crawl on one
    delta chain (the 10^10-frontier regime: O(new) writes per batch,
    deletes applied only at read time) — must be output-invariant."""
    eng = _mk_engine(
        spark,
        world,
        "engine_pending_chain",
        pending_compact_every=10_000,
        pending_delta_max_dels=1 << 40,
    )
    eng.init_from_seeds(world["seeds"])
    metrics = eng.run(max_batches=50)
    done = [m for m in metrics if m.get("fetched")]
    assert int(done[-1].get("pending_base", -1)) == 0  # base never moved
    assert eng.crawl_order() == oracle_run.order
    assert eng.seen_hashes() == oracle_run.seen


def test_overlap_off_same_result(spark, world, oracle_run):
    """Deferred state writes (overlap_state_writes, run()'s pipelined
    mode) are a pure latency optimization — outputs, commits, and the
    final store must be identical to the synchronous mode."""
    eng = _mk_engine(spark, world, "engine_no_overlap", overlap_state_writes=False)
    eng.init_from_seeds(world["seeds"])
    eng.run(max_batches=50)
    assert eng.crawl_order() == oracle_run.order
    assert eng.seen_hashes() == oracle_run.seen


def test_overlap_interrupted_run_resumes(spark, world, oracle_run):
    """Kill a pipelined run() mid-crawl (max_batches cutoff flushes;
    this also exercises flush-at-entry): a fresh engine resumes to the
    oracle's exact order and seen set."""
    eng1 = _mk_engine(spark, world, "engine_overlap_resume")
    eng1.init_from_seeds(world["seeds"])
    eng1.run(max_batches=2)  # stops mid-crawl, flushes deferred state
    eng1.close()
    eng2 = _mk_engine(spark, world, "engine_overlap_resume")
    assert eng2.last_version() == 2  # both batches durable
    eng2.run(max_batches=50)
    assert eng2.crawl_order() == oracle_run.order
    assert eng2.seen_hashes() == oracle_run.seen


def test_no_raw_prededup_same_result(spark, world, oracle_run):
    """raw_prededup=False (canonicalize every raw occurrence, single
    canonical-level groupBy — one shuffle fewer per batch) is a pure
    plan change: crawl order and seen set must be identical."""
    eng = _mk_engine(spark, world, "engine_noprededup", raw_prededup=False)
    eng.init_from_seeds(world["seeds"])
    eng.run(max_batches=50)
    assert eng.crawl_order() == oracle_run.order
    assert eng.seen_hashes() == oracle_run.seen


def test_salted_caps_path_same_result(spark, world, oracle_run, monkeypatch):
    """Force the two-phase SALTED politeness capping (the hot-host
    skew path; engages automatically above SMALL_BATCH_ROWS) through
    the whole crawl loop — capping strategy must be output-invariant."""
    from openalex_collaboration_crawler_spark.streaming import politeness as pol

    monkeypatch.setattr(pol, "SMALL_BATCH_ROWS", -1)
    eng = _mk_engine(spark, world, "engine_saltedcaps")
    eng.init_from_seeds(world["seeds"])
    eng.run(max_batches=50)
    assert eng.crawl_order() == oracle_run.order
    assert eng.seen_hashes() == oracle_run.seen


def test_metrics_table_merge_on_read(spark, world, engine_run):
    """Per-partition lineage is derived on demand from the results
    store; its per-batch totals must agree with the batch metrics."""
    eng, metrics = engine_run
    mt = eng.metrics_table().groupBy("batch_id").sum("fetched").collect()
    got = {r["batch_id"]: r["sum(fetched)"] for r in mt}
    want = {m["batch"]: m["fetched"] for m in metrics if m.get("fetched")}
    assert got == want


def test_ref_lit_int(spark):
    """_ref_lit_int: exact value semantics AND codegen-source stability.

    The helper exists so per-batch ids don't force a fresh Janino
    compile per batch (frontier._ref_lit_int docstring): a new VALUE
    through the same plan shape must trigger ZERO new stage compiles,
    while a plain F.lit control shows the counter is live."""
    from pyspark.sql import functions as F

    from openalex_collaboration_crawler_spark.streaming.frontier import _ref_lit_int

    # exact value, row-invariant
    vals = (
        spark.range(5)
        .select(_ref_lit_int(37).cast("int").alias("b"))
        .collect()
    )
    assert [r.b for r in vals] == [37] * 5

    cm = spark._jvm.org.apache.spark.metrics.source.CodegenMetrics

    def run(col):
        spark.range(3).select(
            (F.col("id") + 1).alias("id2"), col.cast("int").alias("b")
        ).write.format("noop").mode("overwrite").save()

    def compiles():
        return cm.METRIC_COMPILATION_TIME().getCount()

    run(_ref_lit_int(100))  # warm the shape (pays its one compile)
    run(F.lit(100))
    c0 = compiles()
    run(_ref_lit_int(101))
    run(_ref_lit_int(102))
    c1 = compiles()
    assert c1 - c0 == 0, "new _ref_lit_int values must reuse the compiled stage"
    run(F.lit(101))
    c2 = compiles()
    assert c2 - c1 > 0, "control: a new inlined literal must recompile"
