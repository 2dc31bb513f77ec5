"""Degree-class Chung-Lu sampler — the ≥10^8-node null-model path."""

from __future__ import annotations

from pyspark.sql import functions as F

from openalex_collaboration_crawler_spark.operators.graphstats import (
    _degree_class_candidates,
    null_model_stats,
    null_model_stats_degree_class,
)


def test_candidate_rows_scale_with_edges_not_pairs(spark):
    """10^5-node power-law-ish degree sequence: candidate rows must be
    O(expected edges · runs), nowhere near n²."""
    n = 100_000
    deg = spark.range(n).select(
        F.col("id").alias("node"),
        # heavy-tailed-ish integer degrees 1..~60, deterministic
        (F.lit(1) + (F.pow(F.lit(1.00012), F.col("id")) % 60)).cast("long").alias("d"),
    )
    runs = 3
    cand = _degree_class_candidates(deg, n_runs=runs, seed=7)
    rows = cand.count()
    sum_d = deg.agg(F.sum("d")).collect()[0][0]
    exp_edges_per_run = sum_d / 2  # Chung-Lu expectation (no capping)
    assert rows > 0
    # within a small constant of the expected edge volume…
    assert rows < 5 * exp_edges_per_run * runs
    # …and astronomically below the n² pair universe
    assert rows < (n * (n - 1) / 2) * 0.01


def test_sampled_pairs_are_valid_and_deduped(spark):
    deg = spark.range(200).select(
        F.col("id").alias("node"), (F.col("id") % 7 + 1).alias("d")
    )
    cand = _degree_class_candidates(deg, n_runs=2, seed=11)
    df = cand.cache()
    try:
        assert df.where(F.col("i") >= F.col("j")).count() == 0  # canonical i<j
        total = df.count()
        distinct = df.distinct().count()
        assert total == distinct  # no duplicate edge within a run
        nodes = {r["node"] for r in deg.collect()}
        ij = df.select("i", "j").collect()
        assert all(r["i"] in nodes and r["j"] in nodes for r in ij)
    finally:
        df.unpersist()


def test_degree_class_stats_agree_with_exact_sampler(spark):
    """Fixture graph: the degree-class ensemble must reproduce the
    exact pair-Bernoulli sampler's statistics in expectation (same
    edge-probability law, different — documented — sampling design)."""
    edges = [
        (i, j, 1)
        for i in range(40)
        for j in range(i + 1, 40)
        if (i * 31 + j * 17) % 5 == 0
    ]
    w = spark.createDataFrame(edges, "author1 long, author2 long, weight long")
    exact = null_model_stats(w, n_runs=12, seed=42).collect()[0]
    dc = null_model_stats_degree_class(w, n_runs=12, seed=42).collect()[0]
    assert dc["n_runs"] == 12
    # expected edge count identical in law → means within 15%
    assert abs(dc["mean_n_edges"] - exact["mean_n_edges"]) / exact["mean_n_edges"] < 0.15
    assert (
        abs(dc["mean_mean_degree"] - exact["mean_mean_degree"])
        / exact["mean_mean_degree"]
        < 0.15
    )
    # the ensemble varies across runs (variance preserved, not collapsed)
    assert dc["var_n_edges"] > 0


def test_null_model_auto_dispatches_to_degree_class_at_scale(spark):
    """null_model_stats with >max_exact_nodes distinct nodes must
    route to the degree-class sampler (VERDICT r3 #4: the default
    composes safely — the O(n²·runs) pair generator would be 7·10^9
    candidate pairs here and could never finish in-test), producing
    byte-identical output to calling null_model_stats_degree_class
    directly."""
    n = 120_000  # path graph: n-1 edges, degrees 1 and 2
    edges = spark.range(n - 1).select(
        F.col("id").alias("author1"),
        (F.col("id") + 1).alias("author2"),
        F.lit(1).alias("weight"),
    )
    auto = null_model_stats(edges, n_runs=2, seed=5, max_exact_nodes=100_000)
    direct = null_model_stats_degree_class(edges, n_runs=2, seed=5)
    assert auto.collect() == direct.collect()


def test_null_model_exact_path_below_threshold_and_on_none(spark):
    """Below the threshold (and with max_exact_nodes=None) the exact
    Bernoulli path keeps its answers — the r3 oracle row must be
    unaffected by the new switch."""
    edges = spark.createDataFrame(
        [(i, j, 1) for i in range(12) for j in range(i + 1, 12)],
        "author1 long, author2 long, weight long",
    )
    base = null_model_stats(edges, n_runs=3, seed=9).collect()
    forced = null_model_stats(edges, n_runs=3, seed=9, max_exact_nodes=None).collect()
    assert base == forced
