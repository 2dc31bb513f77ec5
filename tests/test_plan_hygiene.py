"""Plan hygiene across EVERY driver query: no accidental cartesian
products or nested-loop joins. Whitelists are intentional patterns:

- cartesian: null_model_stats generates the documented O(n²) Chung-Lu
  candidate pairs via an inequality self-join (fixture-scale path;
  the degree-class optimization is the documented scale swap).
- broadcast nested-loop: crossJoins of ONE-ROW aggregates (totals ×
  triangle counts × assortativity sums; NMI entropy terms; the
  percentile threshold; louvain's modularity invariant; the stability
  ensemble's n_runs column), broadcast query/centroid tables in the
  ANN operators, a constant-folded literal anti-join against the
  broadcast delete list, and null_model_degree_class's D×D
  degree-CLASS pair generator (d1<=d2 inequality join over the tiny
  distinct-degree table — the documented scale swap for the n²
  node-pair cartesian) — all have a tiny build side by construction.

Anything outside the whitelist failing here means a join lost its
equi-condition or a broadcast hint — the classic silent 100×
regression at scale.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

CARTESIAN_OK = {
    "null_model_stats",
    # D×D degree-CLASS pairs via the d1<=d2 inequality self-join over
    # the distinct-degree table (D ≪ n; the documented scale swap for
    # null_model_stats' n² node-pair cartesian)
    "null_model_degree_class",
}
BNLJ_OK = {
    "ann_topk",
    "ann_ivf_topk",
    "transitivity",
    "community_metrics",
    "nmi_nation_vs_region",
    "community_size_split",
    "structural_stats",
    "structural_stats_lcc",
    "null_model_stats",
    "null_model_degree_class",
    "community_topics",
    "community_stability",
    "louvain",
}


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_no_accidental_cartesian_or_nlj(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    cart = len(re.findall("CartesianProduct", plan))
    bnlj = len(re.findall("BroadcastNestedLoopJoin", plan))
    if name not in CARTESIAN_OK:
        assert cart == 0, f"{name}: unexpected CartesianProduct"
    if name not in BNLJ_OK:
        assert bnlj == 0, f"{name}: unexpected BroadcastNestedLoopJoin"
