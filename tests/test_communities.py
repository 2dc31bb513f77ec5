"""Louvain, community metrics, NMI, size-split, pivot."""

from __future__ import annotations

from openalex_collaboration_crawler_spark.operators.analytics import (
    community_size_split,
    nmi,
    topk_pivot,
)
from openalex_collaboration_crawler_spark.operators.graphstats import (
    _louvain_python,
    community_metrics,
    louvain_communities,
)


def test_louvain_two_cliques(spark):
    # two 4-cliques joined by one weak edge → exactly the two cliques
    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j, 10))
    edges.append((0, 10, 1))
    comm = _louvain_python([(u, v, w) for u, v, w in edges], seed=42)
    assert {comm[i] for i in range(4)} == {0}
    assert {comm[10 + i] for i in range(4)} == {10}

    df = spark.createDataFrame(edges, "author1 long, author2 long, weight long")
    got = {r["node"]: r["community"] for r in louvain_communities(df).collect()}
    assert got == comm  # Spark path identical to the pure solver


def test_louvain_deterministic(spark):
    edges = [(i, (i * 3 + 1) % 20, 1 + i % 5) for i in range(40)]
    a = _louvain_python(edges, seed=42)
    b = _louvain_python(edges, seed=42)
    assert a == b


def test_community_metrics_perfect_partition(spark):
    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j, 1))
    e = spark.createDataFrame(edges, "author1 long, author2 long, weight long")
    m = spark.createDataFrame(
        [(n, n // 10) for n in list(range(4)) + list(range(10, 14))],
        "node long, community long",
    )
    got = community_metrics(e, m).collect()[0]
    assert got["coverage"] == 1.0  # all edges intra
    assert got["performance"] == 1.0  # and all non-edges inter
    assert got["modularity"] == 0.5  # two equal modules, no inter edges


def test_nmi_identical_and_independent(spark):
    a = spark.createDataFrame([(n, n % 2) for n in range(40)], "node long, label long")
    assert nmi(a, a).collect()[0]["nmi"] == 1.0
    b = spark.createDataFrame([(n, 0) for n in range(40)], "node long, label long")
    # single-cluster labeling carries zero information → NMI 0 (H(b)=0
    # edge: nx/sklearn convention → denominator H(a)+H(b) > 0 here)
    assert nmi(a, b).collect()[0]["nmi"] == 0.0


def test_community_size_split(spark):
    rows = [(f"c{c}", n) for c in range(5) for n in range(c + 1)] + [
        ("big", n) for n in range(50)
    ]
    m = spark.createDataFrame(rows, "community string, node long")
    got = {r["community_label"]: r for r in community_size_split(m, pct=0.9).collect()}
    assert "big" in got and got["big"]["n_nodes"] == 50
    assert got["sink"]["n_communities"] == 5


def test_topk_pivot(spark):
    df = spark.createDataFrame(
        [(1, "x")] * 3 + [(1, "y")] * 2 + [(1, "z")], "g int, item string"
    )
    got = topk_pivot(df, "g", "item", k=3).collect()[0]
    assert (got["rank_1"], got["rank_2"], got["rank_3"]) == ("x", "y", "z")
