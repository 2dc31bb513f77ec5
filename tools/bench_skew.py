"""Hot-host skew evidence on the crawl path (north rule: salted
repartitioning defuses hot-host skew).

Builds a zipf-head frontier (35% of URLs on one host, power-law tail
over ~1000 hosts), applies binding per-host politeness caps through
``select_batch`` at local[16], and measures per-stage task-time skew
(max task / median task) for the single-window capping vs the
two-phase salted capping — plus an order-insensitive equality hash
proving both produce the identical batch.

Usage: python tools/bench_skew.py [n_rows]   (default 3,000,000)
Prints one JSON line; numbers land in BENCH/BASELINE.md §3.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/spark_graft_bench")
EVLOG = os.path.join(WORK, "skew_evlog")
PER_HOST_CAP = 2000


def task_skew(evlog_dir: str, windows: dict[str, tuple[float, float]]) -> dict:
    """Per-phase task-time stats from the event log: for each named
    wall-clock window, the heaviest stage's max/median task ms."""
    import statistics

    # Spark 4 rolling event logs are DIRECTORIES (eventlog_v2_<appid>/
    # with events_* part files inside); walk instead of listdir.
    # same skip filter as analyze_eventlog._iter_lines: a leftover
    # .zstd (compressed) log would raise UnicodeDecodeError below,
    # crashing AFTER the expensive benchmark already ran (r5 ADVICE)
    files = [
        os.path.join(root, f)
        for root, _, names in os.walk(evlog_dir)
        for f in names
        if not f.startswith("appstatus_") and not f.endswith(".zstd")
    ]
    stage_tasks: dict[int, list[tuple[int, int]]] = {}
    for path in files:
        for line in open(path):
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("Event") == "SparkListenerTaskEnd":
                ti = ev["Task Info"]
                stage_tasks.setdefault(ev["Stage ID"], []).append(
                    (ti["Launch Time"], ti["Finish Time"])
                )
    out = {}
    for name, (t0, t1) in windows.items():
        best = None
        for sid, ts in stage_tasks.items():
            in_win = [(a, b) for a, b in ts if t0 * 1000 <= a and b <= t1 * 1000]
            if len(in_win) < 2:
                continue
            durs = sorted(b - a for a, b in in_win)
            med = statistics.median(durs) or 1
            cand = {
                "stage": sid,
                "ntasks": len(durs),
                "max_ms": durs[-1],
                "median_ms": med,
                "max_over_median": round(durs[-1] / med, 2),
            }
            # the skew-relevant stage is the one with the LONGEST task
            if best is None or cand["max_ms"] > best["max_ms"]:
                best = cand
        out[name] = best
    return out


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    if os.path.isdir(EVLOG):
        shutil.rmtree(EVLOG)
    os.makedirs(EVLOG)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("bench_skew")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVLOG)
        # plain single-file JSON logs so task_skew can read them directly
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        # AQE's own skew mitigation OFF so the measurement isolates the
        # engine's explicit salting (on a real cluster both are on)
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from openalex_collaboration_crawler_spark.sources.pages import build_zipf_frontier
    from openalex_collaboration_crawler_spark.streaming.politeness import select_batch

    frontier_path = os.path.join(WORK, f"zipf_frontier_{n_rows}")
    if not os.path.isdir(frontier_path):
        build_zipf_frontier(spark, n_rows=n_rows).write.mode("overwrite").parquet(
            frontier_path
        )
    pending = spark.read.parquet(frontier_path)
    politeness = spark.createDataFrame(
        [("host0.example.org", PER_HOST_CAP)], "host string, max_per_batch int"
    )

    def run(salted: bool) -> tuple[float, float, int]:
        sel = select_batch(
            pending,
            politeness,
            robots=None,
            default_per_host=PER_HOST_CAP,
            est_rows=n_rows,
            salt_caps=salted,
        )
        t0 = time.time()
        sel.write.format("noop").mode("overwrite").save()
        t1 = time.time()
        return t0, t1, t1 - t0

    # warm-up (codegen + page cache), then measured passes
    run(True)
    u0, u1, unsalted_wall = run(False)
    s0, s1, salted_wall = run(True)

    # order-insensitive equality: count + xor-free sum of row hashes
    def sig(salted: bool):
        sel = select_batch(
            pending,
            politeness,
            robots=None,
            default_per_host=PER_HOST_CAP,
            est_rows=n_rows,
            salt_caps=salted,
        )
        return sel.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("seq", "url", "url_hash", "depth", "priority")).alias("h"),
        ).collect()[0]

    a, b = sig(False), sig(True)
    spark.stop()
    time.sleep(2)  # event log flush
    skew = task_skew(EVLOG, {"unsalted": (u0, u1), "salted": (s0, s1)})
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "per_host_cap": PER_HOST_CAP,
                "identical_output": (a["n"] == b["n"] and a["h"] == b["h"]),
                "batch_rows": a["n"],
                "unsalted_wall_sec": round(unsalted_wall, 2),
                "salted_wall_sec": round(salted_wall, 2),
                "task_skew": skew,
            }
        )
    )


if __name__ == "__main__":
    main()
