"""Measure IVF ANN retrieval quality, not just determinism.

The gate oracle proves `ann_ivf_topk` is reproducible; this tool
measures whether it *retrieves* well: recall@k of `ivf_topk` vs the
exact `brute_force_topk` ground truth on the driver's embeddings
table, for the gate's hash codebook AND the Lloyd-refined kmeans
codebook, across n_probe settings.

recall@k = |IVF top-k pairs ∩ exact top-k pairs| / |exact top-k pairs|
(pair = (query_id, vec_id); k and tie-breaks identical on both sides).

Usage: python tools/ivf_recall.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line; numbers land in BENCH/BASELINE.md §3.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from openalex_collaboration_crawler_spark.session import get_spark
    from openalex_collaboration_crawler_spark.operators import similarity as SIM

    spark = get_spark(app_name="ivf_recall")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    n = emb.count()
    # more queries than the 8-query gate fixture for a stable estimate
    queries = emb.where(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    k = 5
    exact = {
        (r["query_id"], r["vec_id"])
        for r in SIM.brute_force_topk(emb, queries, k=k).collect()
    }

    def recall(codebook: str, n_probe: int) -> float:
        got = {
            (r["query_id"], r["vec_id"])
            for r in SIM.ivf_topk(
                emb, queries, k=k, n_probe=n_probe, codebook=codebook
            ).collect()
        }
        return round(len(got & exact) / len(exact), 4)

    out = {"sf_dir": sf_dir, "corpus_rows": n, "queries": 64, "k": k, "recall": {}}
    for codebook in ("hash", "kmeans"):
        for n_probe in (1, 2, 4, 8):
            out["recall"][f"{codebook}_probe{n_probe}"] = recall(codebook, n_probe)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
