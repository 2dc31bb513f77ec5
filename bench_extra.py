"""Extra benchmarks for optimization work (guide §1.4): per-query
noop-sink isolation with repeats, optional plan capture.

NOT the frozen driver bench (bench.py untouched). Usage:

    python bench_extra.py [--reps N] [--plans DIR] [query ...]

Runs each named query (default: bench.py HEADLINE) reps times in one
warmed session, printing per-rep seconds + min/median, and (with
--plans) writing `explain("formatted")` to DIR/<query>.txt.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plans", default=None, help="dir for explain('formatted') capture")
    ap.add_argument("--suffix", default="", help="suffix for plan filenames (_before/_after)")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_extra")

    # session warm-up (mirrors bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from openalex_collaboration_crawler_spark.sources.tables import load_table

    load_table(spark, sf_dir, "region").count()

    queries = entrymod.queries()
    names = args.queries or HEADLINE
    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                    df._jdf.queryExecution(), "formatted"))
            del df
        reps = []
        for i in range(args.reps):
            gc.collect()  # release prior localCheckpoint blocks
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "reps": reps,
            "min": min(reps),
            "median": round(statistics.median(reps), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()},
                      "summary_median": {k: v["median"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
