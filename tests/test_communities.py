"""Louvain, community metrics, NMI, size-split, pivot."""

from __future__ import annotations

import pytest

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


def test_louvain_ensemble_stability(spark):
    """Script-06 composition: R seeded runs → pairwise NMI mean/std.
    Two strong cliques + a weak bridge: every seed finds the same
    2-community partition → nmi_mean == 1.0, nmi_std == 0.0; the
    distributed ensemble stats agree with a per-pair python NMI."""
    import math

    from openalex_collaboration_crawler_spark.operators.analytics import (
        pairwise_nmi_stats,
    )
    from openalex_collaboration_crawler_spark.operators.graphstats import (
        louvain_ensemble,
    )

    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j, 10))
    edges.append((0, 10, 1))
    df = spark.createDataFrame(edges, "author1 long, author2 long, weight long")

    mem = louvain_ensemble(df, runs=4, seed0=7)
    rows = mem.collect()
    runs = {r["run"] for r in rows}
    assert runs == {0, 1, 2, 3}
    # every run labels all 8 nodes, identically to the seeded solver
    for run in runs:
        labels = {r["node"]: r["label"] for r in rows if r["run"] == run}
        assert labels == _louvain_python(edges, seed=7 + run)

    got = pairwise_nmi_stats(mem).collect()[0]
    assert got["n_runs"] == 4 and got["n_pairs"] == 6
    assert got["nmi_mean"] == 1.0 and got["nmi_std"] == 0.0

    # heterogeneous labelings: distributed stats == hand NMI over pairs
    lab = [
        {n: n % 2 for n in range(12)},          # even/odd
        {n: n // 6 for n in range(12)},         # halves
        {n: n % 2 for n in range(12)},          # even/odd again
    ]
    mem2 = spark.createDataFrame(
        [(r, n, l) for r, d in enumerate(lab) for n, l in d.items()],
        "run long, node long, label long",
    )
    got2 = pairwise_nmi_stats(mem2).collect()[0]

    def h(counts, n):
        return -sum(c / n * math.log(c / n) for c in counts.values())

    def py_nmi(a, b):
        n = len(a)
        cont = {}
        ca, cb = {}, {}
        for node in a:
            key = (a[node], b[node])
            cont[key] = cont.get(key, 0) + 1
            ca[a[node]] = ca.get(a[node], 0) + 1
            cb[b[node]] = cb.get(b[node], 0) + 1
        mi = sum(
            c / n * math.log(n * c / (ca[i] * cb[j])) for (i, j), c in cont.items()
        )
        denom = h(ca, n) + h(cb, n)
        return 1.0 if denom == 0 else 2 * mi / denom

    vals = [py_nmi(lab[i], lab[j]) for i in range(3) for j in range(i + 1, 3)]
    mean = sum(vals) / len(vals)
    std = math.sqrt(sum(v * v for v in vals) / len(vals) - mean * mean)
    assert abs(got2["nmi_mean"] - round(mean, 6)) < 1e-9
    assert abs(got2["nmi_std"] - round(std, 6)) < 1e-9


def test_louvain_per_interval_default_and_guard(spark):
    """graph_col defaults to the interval column when present (parallel
    per-interval groups), and the solve refuses oversized groups."""
    import pytest

    from openalex_collaboration_crawler_spark.operators.graphstats import (
        louvain_communities,
    )

    edges = []
    for interval in ("1990-2000", "2000-2010"):
        base = 0 if interval < "2000" else 100
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((interval, base + i, base + j, 5))
    df = spark.createDataFrame(
        edges, "interval string, author1 long, author2 long, weight long"
    )
    out = louvain_communities(df).collect()  # no graph_col passed
    graphs = {r["graph"] for r in out}
    assert graphs == {"1990-2000", "2000-2010"}  # grouped per interval
    # per-interval membership matches the single-graph solve of that slice
    for interval, base in (("1990-2000", 0), ("2000-2010", 100)):
        sub = {r["node"]: r["community"] for r in out if r["graph"] == interval}
        want = _louvain_python(
            [(u, v, w) for iv, u, v, w in edges if iv == interval], seed=42
        )
        assert sub == want

    plain = df.drop("interval")
    with pytest.raises(Exception, match="max_edges_per_group"):
        louvain_communities(plain, max_edges_per_group=3).collect()


def test_louvain_graph_col_none_is_single_global_solve(spark):
    """graph_col=None must ALWAYS mean one global solve — even when
    the frame carries a LOUVAIN_DEFAULT_GRAPH_COLS column (round-3
    ADVICE: auto-detection is opt-in via the explicit 'auto' sentinel,
    the default; an external caller passing None must not silently
    flip to per-group solves)."""
    from openalex_collaboration_crawler_spark.operators.graphstats import (
        louvain_communities,
    )

    edges = []
    for interval in ("1990-2000", "2000-2010"):
        base = 0 if interval < "2000" else 100
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((interval, base + i, base + j, 5))
    # bridge edge so the global solve differs structurally from the
    # per-interval union
    edges.append(("1990-2000", 3, 100, 5))
    df = spark.createDataFrame(
        edges, "interval string, author1 long, author2 long, weight long"
    )
    out = louvain_communities(df, graph_col=None).collect()
    assert {r["graph"] for r in out} == {"all"}          # ONE global graph
    want = _louvain_python([(u, v, w) for _, u, v, w in edges], seed=42)
    assert {r["node"]: r["community"] for r in out} == want
    # and 'auto' (the default) still groups per interval
    auto = louvain_communities(df).collect()
    assert {r["graph"] for r in auto} == {"1990-2000", "2000-2010"}


def test_louvain_networkx_impl_matches_reference_solver(spark, sf_dir):
    """impl="networkx" gives EXACT partition parity with the reference's
    literal call — nx.community.louvain_communities(G, seed=42)
    (/root/reference/analysis/05_community_extraction.py:60-63) — on the
    same backbone the louvain gate query uses (weight >= 3 slice of the
    collaboration graph). The engine's distributed applyInPandas solve
    must equal a driver-side networkx run over the identical edge list;
    community ids use this module's min-member convention, which is a
    pure relabeling of the reference's partition (set-identical)."""
    nx = pytest.importorskip("networkx")
    from pyspark.sql import functions as F

    from openalex_collaboration_crawler_spark.operators import edges as ED
    from openalex_collaboration_crawler_spark.sources.tables import collab_model

    w = ED.weighted_edges(ED.pairwise_edges(collab_model(spark, sf_dir))).where(
        F.col("weight") >= 3
    )
    rows = w.collect()
    G = nx.Graph()
    for r in rows:
        G.add_edge(int(r["author1"]), int(r["author2"]), weight=float(r["weight"]))
    ref = nx.community.louvain_communities(G, weight="weight", seed=42)
    want = {int(n): int(min(c)) for c in ref for n in c}

    got = {
        r["node"]: r["community"]
        for r in louvain_communities(w, seed=42, impl="networkx").collect()
    }
    assert got == want

    # default impl unchanged: native solver still returns a valid
    # partition over the same node set (not necessarily the same one)
    native = {
        r["node"]: r["community"]
        for r in louvain_communities(w, seed=42).collect()
    }
    assert set(native) == set(want)
