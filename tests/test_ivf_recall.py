"""IVF retrieval QUALITY gate (VERDICT r4 task 5).

The driver-gate oracle proves ``ann_ivf_topk`` is deterministic; these
tests pin a recall@k floor vs the exact ``brute_force_topk`` ground
truth on the sf0.001 fixture so a codebook/probe regression that
silently destroys retrieval quality (while staying deterministic)
fails the suite. Floors were measured on the sf0.001 fixture
(hash codebook 0.619, Lloyd codebook 0.744 at 16 cells / probe 4;
probe 16 = 1.0 exactly — see BENCH/BASELINE.md §3) and pinned with
headroom below the observed values; both codebooks and the
probe-sweep monotonicity are covered.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openalex_collaboration_crawler_spark.operators import similarity as SIM
from openalex_collaboration_crawler_spark.sources.tables import load_table

K = 5
N_QUERIES = 32


def _pairs(df) -> set[tuple[int, int]]:
    return {(r["query_id"], r["vec_id"]) for r in df.collect()}


def _setup(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = _pairs(SIM.brute_force_topk(emb, queries, k=K))
    assert len(exact) == N_QUERIES * K
    return emb, queries, exact


def _recall(emb, queries, exact, **kw) -> float:
    got = _pairs(SIM.ivf_topk(emb, queries, k=K, **kw))
    return len(got & exact) / len(exact)


def test_ivf_hash_codebook_recall_floor(spark, sf_dir):
    emb, queries, exact = _setup(spark, sf_dir)
    # measured 0.619 on the fixture (hash codebook, 16 cells, probe 4)
    assert _recall(emb, queries, exact, n_probe=4) >= 0.55


def test_ivf_kmeans_codebook_recall_floor(spark, sf_dir):
    emb, queries, exact = _setup(spark, sf_dir)
    # measured 0.744 on the fixture (Lloyd codebook, 16 cells, probe 4)
    # vs 0.619 for the hash codebook at identical settings — the
    # refinement must keep beating the hash seed, not just pass a floor
    assert _recall(emb, queries, exact, n_probe=4, codebook="kmeans") >= 0.65


def test_ivf_probe_sweep_monotone_to_exact(spark, sf_dir):
    """Probing every cell must reproduce the exact ground truth, and
    recall must not decrease as n_probe grows (candidate sets nest)."""
    emb, queries, exact = _setup(spark, sf_dir)
    rs = [
        _recall(emb, queries, exact, n_probe=p, n_centroids=16) for p in (1, 4, 16)
    ]
    assert rs == sorted(rs)
    assert rs[-1] == 1.0
