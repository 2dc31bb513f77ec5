"""Graph-algorithm tests: CC, disparity backbone, transitivity."""

from __future__ import annotations

from openalex_collaboration_crawler_spark.operators.graphstats import (
    connected_components,
    disparity_backbone,
    n_connected_components,
    transitivity,
    triangle_count,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "author1 long, author2 long, weight long")


def test_connected_components_two_islands(spark):
    e = _edges(spark, [(1, 2, 1), (2, 3, 1), (10, 11, 1), (5, 5, 1)])
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert n_connected_components(e) == 2  # self-loop-only node excluded


def test_connected_components_chain_diameter(spark):
    # long path exercises multi-iteration convergence
    e = _edges(spark, [(i, i + 1, 1) for i in range(1, 12)])
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert set(got.values()) == {1}


def test_disparity_backbone_hub(spark):
    # hub 0 with one dominant edge among many weak ones → dominant
    # edge significant, weak ones not
    rows = [(0, 1, 100)] + [(0, k, 1) for k in range(2, 12)]
    e = _edges(spark, rows)
    kept = {(r["author1"], r["author2"]) for r in disparity_backbone(e, 0.05).collect()}
    assert (0, 1) in kept
    assert all(b == 1 for _, b in kept)  # weak spokes filtered


def test_triangle_and_transitivity(spark):
    # triangle 1-2-3 plus pendant 3-4: 1 triangle, nx.transitivity = 3*1/5
    e = _edges(spark, [(1, 2, 1), (2, 3, 1), (1, 3, 1), (3, 4, 1)])
    assert triangle_count(e).collect()[0]["n_triangles"] == 1
    t = transitivity(e).collect()[0]["transitivity"]
    assert abs(t - 3.0 / 5.0) < 1e-9
