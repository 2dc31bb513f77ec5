"""Benchmark harness — one JSON line to stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the
north-star frontier-throughput crawl bench on a deterministic
synthetic page table. Each query is fully executed via the noop
writer (no driver collect).

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "frontier_urls_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from openalex_collaboration_crawler_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pairwise_edges",
    "weighted_edges",
    "degree_stats",
    "topk_parts_per_year",
    "sessionize",
    "text_stats",
    "dedup_exact",
    "minhash_candidates",
    "simhash",
    "ann_topk",
    "tpch_pricing_summary",
]

CRAWL_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))


def run_query(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def crawl_bench(spark, workdir: str) -> tuple[float, float, int]:
    """North-star metric: URLs fetched+deduped per second through the
    frontier loop (politeness wide-open so the engine, not the budget,
    is measured)."""
    from openalex_collaboration_crawler_spark.sources.pages import (
        build_pages,
        build_politeness,
        build_seeds,
    )
    from openalex_collaboration_crawler_spark.streaming.frontier import CrawlEngine

    pages_path = os.path.join(workdir, f"pages_{CRAWL_PAGES}")
    if not os.path.isdir(pages_path):
        build_pages(spark, n_pages=CRAWL_PAGES).write.mode("overwrite").parquet(pages_path)

    eng = CrawlEngine(
        spark=spark,
        state_dir=os.path.join(workdir, "crawl_state"),
        pages_path=pages_path,
        politeness=build_politeness(spark, default_per_batch=(1 << 31) - 1, hot_per_batch=(1 << 31) - 1),
        robots=None,
        default_per_host=(1 << 31) - 1,
        bloom_parts=16,
    )
    # enough seeds that the frontier saturates in a few large batches —
    # measures per-URL throughput, not per-batch job-launch latency
    eng.init_from_seeds(build_seeds(spark, n_pages=CRAWL_PAGES, n_seeds=1024))
    t0 = time.time()
    metrics = eng.run(max_batches=30)
    dt = time.time() - t0
    n_fetched = sum(m.get("fetched", 0) for m in metrics)
    n_deduped = sum(m.get("deduped", 0) for m in metrics)
    urls = n_fetched + n_deduped
    return dt, urls / dt if dt > 0 else 0.0, urls


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")

    # Warm the session before timing (r4): the first Spark action pays
    # ~8-10 s of one-time JVM/python-worker/codegen warm-up that used
    # to land entirely on whichever query ran first (pairwise_edges),
    # drowning the signal the bench exists to measure. A trivial noop
    # write + one parquet count isolate query cost from session cost;
    # queries still run cold w.r.t. THEIR OWN scans and shuffles.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from openalex_collaboration_crawler_spark.sources.tables import load_table

    load_table(spark, sf_dir, "region").count()

    queries = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        times[name] = round(run_query(spark, queries[name], sf_dir), 3)

    workdir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/spark_graft_bench")
    os.makedirs(workdir, exist_ok=True)
    crawl_sec, crawl_tput, crawl_urls = crawl_bench(spark, workdir)
    times["frontier_crawl"] = round(crawl_sec, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_frontier_crawl_total_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "frontier_urls_per_sec": round(crawl_tput, 1),
                "frontier_urls": crawl_urls,
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
