"""The fixed scaling workload, launched via spark-submit --py-files.

Runs the identical job at whatever --master the submitter chose:
  1. frontier crawl over a pre-built synthetic page table
     (north-star: URLs fetched+deduped)
  2. a compute-heavy batch query set at $SPARK_GRAFT_SF_DIR

Prints one JSON line {cores, crawl_sec, crawl_urls, queries_sec}.
tools/bench_scaling.py runs this at two parallelism levels and
computes the scaling efficiency for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    state_dir = sys.argv[3]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # shuffle partitions FIXED across runs: the job (plan shape, task
    # granularity) is identical; only the executor-thread count varies —
    # exactly the N vs 4N cluster-size comparison the north rule asks for.
    spark = (
        SparkSession.builder.appName(f"scaling_job_{cores}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JIT/codegen + python-worker spawn happen before the clock
    from pyspark.sql import functions as _F

    spark.range(1 << 20).select(_F.md5(_F.col("id").cast("string"))).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(1000).toPandas()

    from openalex_collaboration_crawler_spark.sources.pages import (
        build_politeness,
        build_seeds,
    )
    from openalex_collaboration_crawler_spark.streaming.frontier import CrawlEngine

    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
    n_seeds = int(os.environ.get("SPARK_GRAFT_SCALE_SEEDS", "65536"))
    eng = CrawlEngine(
        spark=spark,
        state_dir=state_dir,
        pages_path=pages_path,
        politeness=build_politeness(spark, (1 << 31) - 1, (1 << 31) - 1),
        robots=None,
        default_per_host=(1 << 31) - 1,
        bloom_parts=16,
    )
    # many seeds → the frontier saturates in a few LARGE batches, so the
    # measurement is dominated by per-URL work, not per-batch job launches
    eng.init_from_seeds(build_seeds(spark, n_pages=n_pages, n_seeds=n_seeds))
    t0 = time.time()
    metrics = eng.run(max_batches=30)
    crawl_sec = time.time() - t0
    crawl_urls = sum(m.get("fetched", 0) + m.get("deduped", 0) for m in metrics)

    from pyspark.sql import functions as F

    from openalex_collaboration_crawler_spark.operators import dedup as DD

    repl = int(os.environ.get("SPARK_GRAFT_SCALE_REPL", "32"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big_docs = (
        docs.withColumn("r", F.explode(F.sequence(F.lit(1), F.lit(repl))))
        .select((F.col("doc_id") * repl + F.col("r")).alias("doc_id"), "text")
        .repartition(128)  # identical split at every parallelism level
    )
    t0 = time.time()
    DD.minhash_signatures(big_docs).write.format("noop").mode("overwrite").save()
    DD.simhash(big_docs).write.format("noop").mode("overwrite").save()
    queries_sec = time.time() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "crawl_sec": round(crawl_sec, 2),
                "crawl_urls": crawl_urls,
                "queries_sec": round(queries_sec, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
