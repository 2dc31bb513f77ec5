"""Isolated 4-vs-16-core ceiling for the crawl's SHUFFLE component.

The crawl loop is a blend of two kinds of work: Arrow/python gzip+JSON
decode (ceiling measured by tools/decode_probe.py) and JVM
shuffle/string work — explode outlinks, raw-string dedup, URL
canonicalization, hash-agg. This probe measures the second component
alone, on the same link distribution the crawl sees, with no crawl
machinery: one explode → groupBy(raw) → canonicalize → groupBy(canon)
→ count pipeline over N synthetic pages' outlinks.

    spark-submit --master local[C] tools/shuffle_probe.py C <pages_prepared>

Prints {"cores": C, "shuffle_sec": S, "rows": n}. Efficiency between
two runs = (T_lo/T_hi)·(C_lo/C_hi) — the box's ceiling for this work
shape, against which the full crawl's efficiency is decomposed in
BENCH/BASELINE.md §2.1.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    spark = (
        SparkSession.builder.appName(f"shuffle_probe_{cores}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from openalex_collaboration_crawler_spark.functions.url import (
        canonicalize_url,
        url_hash,
    )

    spark.range(1 << 20).select(F.md5(F.col("id").cast("string"))).write.format(
        "noop"
    ).mode("overwrite").save()

    # per-page outlink lists mimicked by fanning each prepared URL out
    # 12× with messy variants — the same row volume and string shapes
    # the crawl's discovery pipeline shuffles on its biggest batch
    pages = spark.read.parquet(pages_path)
    base = pages.select("canonical_url")
    fan = base.select(
        F.explode(F.sequence(F.lit(1), F.lit(12))).alias("k"), "canonical_url"
    ).select(
        F.concat(
            F.lit("http://"),
            F.substring_index(F.col("canonical_url"), "://", -1),
            F.when(F.col("k") % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
        ).alias("raw_url"),
        (F.col("k") % 5).alias("pdepth"),
    )
    t0 = time.time()
    n = (
        fan.groupBy("raw_url")
        .agg(F.min("pdepth").alias("pdepth"))
        .select(canonicalize_url("raw_url").alias("url"), "pdepth")
        .groupBy("url")
        .agg(F.min("pdepth").alias("d"))
        .select(url_hash("url").alias("h"))
        .groupBy((F.col("h") % 64).alias("p"))
        .count()
        .count()
    )
    sec = time.time() - t0
    print(json.dumps({"cores": cores, "shuffle_sec": round(sec, 2), "rows": n}))
    spark.stop()


if __name__ == "__main__":
    main()
