"""Isolated scaling probe for the Arrow/python decode path.

Measures gzip+JSON decode of the prepared pages table through
``mapInPandas`` alone (no crawl machinery) at a given core count —
the component ceiling any decode-heavy phase is bounded by on a
single box. Usage:

    spark-submit --master local[N] tools/decode_probe.py N [pages_prepared_path]

Round-2 measurements on this host (3M pages, ~50 KB uncompressed each):
local[2] 76.3s, local[4] 51.8s, local[8] 30.4s, local[16] 18.3s
→ 4→16 scaling efficiency 0.71 (the python-worker/memory-bandwidth
ceiling; the JVM-side hash phase measures 0.85, a pure busy-loop 0.89).
"""

import gzip
import json
import sys
import time

import pandas as pd
from pyspark.sql import SparkSession


def main() -> None:
    cores = int(sys.argv[1])
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_bench/pages_3000000_x400_prepared"
    spark = (
        SparkSession.builder.appName(f"decode_probe_{cores}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(path)

    def decode(batches):
        for pdf in batches:
            ok = []
            for html in pdf["html"]:
                try:
                    body = json.loads(gzip.decompress(bytes(html)).decode("utf-8"))
                    ok.append(body.get("text") is not None)
                except Exception:  # noqa: BLE001
                    ok.append(False)
            yield pd.DataFrame({"ok": ok})

    pages.limit(10000).mapInPandas(decode, "ok boolean").write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.time()
    pages.mapInPandas(decode, "ok boolean").write.format("noop").mode("overwrite").save()
    print(json.dumps({"cores": cores, "decode_sec": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
