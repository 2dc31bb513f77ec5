"""Graph algorithms as DataFrame programs (reference analysis/ layer).

- connected components: iterative min-label propagation (the
  reference uses networkx's in-memory CC inside
  compute_structural_statistics.py:36-55 / 08_graphs_property_
  validation.py:50-88; here it is a shuffle-per-iteration loop that
  scales to edges that don't fit one machine).
- disparity backbone (reference 03_backbone.py:38-46 via netbone):
  closed-form Serrano-Boguñá p-value p_uv = (1 - w/s_u)^(k_u - 1) —
  pure column math after one degree/strength join; an edge survives
  if min(p from either endpoint) < threshold.
- triangle count / transitivity (08_graphs_property_validation.py:
  50-88 via nx.transitivity): degree-ordered edge orientation (each
  triangle counted exactly once, hub fan-out bounded) — the standard
  distributed formulation.

All deterministic; CC has a DuckDB recursive-CTE oracle in
__spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame, a: str, b: str) -> DataFrame:
    """Symmetrized edge list without self-loops: (u, v) both ways."""
    e = edges.select(F.col(a).alias("u"), F.col(b).alias("v")).where(F.col(a) != F.col(b))
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()


def connected_components(
    edges: DataFrame, a: str = "author1", b: str = "author2", max_iter: int = 50
) -> DataFrame:
    """(node, component): component = min node id reachable.

    Min-label propagation: each pass joins labels to neighbors and
    takes the min; converges in O(diameter) passes. Per pass: one
    shuffle on node. ``localCheckpoint`` truncates the plan so the
    lineage doesn't grow with iterations (the classic iterative-
    DataFrame trap). Isolated nodes keep their own id."""
    adj = _undirected(edges, a, b).cache()
    labels = (
        adj.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            adj.join(labels, adj.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    adj.unpersist()
    return labels


def n_connected_components(edges: DataFrame, a: str = "author1", b: str = "author2") -> int:
    return connected_components(edges, a, b).select("component").distinct().count()


def disparity_backbone(
    weighted: DataFrame,
    threshold: float = 0.05,
    a: str = "author1",
    b: str = "author2",
    w: str = "weight",
) -> DataFrame:
    """Edges whose disparity p-value < threshold from either endpoint
    (reference 03_backbone.py:43-44: netbone.disparity +
    threshold_filter(0.05)).

    p_uv(from u) = (1 - w/s_u)^(k_u - 1); keep if min(p_u, p_v) <
    threshold. One groupBy for (degree, strength), two broadcastable
    joins, pure column math — no per-edge Python. Output keeps
    (author1, author2, weight, p_value)."""
    e = weighted.select(
        F.col(a).alias("author1"), F.col(b).alias("author2"), F.col(w).alias("weight")
    ).where(F.col(a) != F.col(b))
    ends = e.select(F.col("author1").alias("node"), "weight").unionAll(
        e.select(F.col("author2").alias("node"), "weight")
    )
    stats = ends.groupBy("node").agg(
        F.count("*").alias("k"), F.sum("weight").alias("s")
    )
    su = stats.select(
        F.col("node").alias("author1"), F.col("k").alias("k_u"), F.col("s").alias("s_u")
    )
    sv = stats.select(
        F.col("node").alias("author2"), F.col("k").alias("k_v"), F.col("s").alias("s_v")
    )
    p_u = F.pow(
        1.0 - F.col("weight").cast("double") / F.col("s_u").cast("double"),
        F.col("k_u").cast("double") - 1.0,
    )
    p_v = F.pow(
        1.0 - F.col("weight").cast("double") / F.col("s_v").cast("double"),
        F.col("k_v").cast("double") - 1.0,
    )
    return (
        e.join(su, "author1")
        .join(sv, "author2")
        .withColumn("p_value", F.least(p_u, p_v))
        .where(F.col("p_value") < threshold)
        .select("author1", "author2", "weight", F.round("p_value", 6).alias("p_value"))
    )


def disparity_backbone_sql(weighted_sql: str, threshold: float = 0.05) -> str:
    return f"""
WITH e AS (SELECT author1, author2, weight FROM ({weighted_sql}) WHERE author1 <> author2),
ends AS (
  SELECT author1 AS node, weight FROM e
  UNION ALL SELECT author2 AS node, weight FROM e
),
stats AS (SELECT node, count(*) AS k, sum(weight) AS s FROM ends GROUP BY node)
SELECT e.author1, e.author2, e.weight,
       round(least(
         pow(1.0 - CAST(e.weight AS DOUBLE) / CAST(su.s AS DOUBLE), CAST(su.k AS DOUBLE) - 1.0),
         pow(1.0 - CAST(e.weight AS DOUBLE) / CAST(sv.s AS DOUBLE), CAST(sv.k AS DOUBLE) - 1.0)
       ), 6) AS p_value
FROM e JOIN stats su ON e.author1 = su.node JOIN stats sv ON e.author2 = sv.node
WHERE least(
         pow(1.0 - CAST(e.weight AS DOUBLE) / CAST(su.s AS DOUBLE), CAST(su.k AS DOUBLE) - 1.0),
         pow(1.0 - CAST(e.weight AS DOUBLE) / CAST(sv.s AS DOUBLE), CAST(sv.k AS DOUBLE) - 1.0)
       ) < {threshold}
"""


def triangle_count(edges: DataFrame, a: str = "author1", b: str = "author2") -> DataFrame:
    """Total triangle count via degree-ordered orientation: orient each
    edge from the (degree, id)-smaller endpoint to the larger, join
    out-neighbors pairwise, check the closing edge. Every triangle is
    counted exactly once and no node fans out more than O(sqrt(|E|))
    — the standard skew-proof formulation."""
    und = _undirected(edges, a, b)
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    e = (
        und.join(deg.withColumnRenamed("u", "u_").withColumnRenamed("d", "du"), F.col("u") == F.col("u_"))
        .drop("u_")
        .join(deg.withColumnRenamed("u", "v_").withColumnRenamed("d", "dv"), F.col("v") == F.col("v_"))
        .drop("v_")
    )
    oriented = e.where(
        (F.col("du") < F.col("dv")) | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    ).select("u", "v")
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .where(F.col("e1.v") < F.col("e2.v"))
        .select(F.col("e1.u").alias("w0"), F.col("e1.v").alias("w1"), F.col("e2.v").alias("w2"))
    )
    closing = oriented.select(F.col("u").alias("w1"), F.col("v").alias("w2")).unionByName(
        oriented.select(F.col("v").alias("w1"), F.col("u").alias("w2"))
    )
    tri = wedges.join(closing, ["w1", "w2"], "left_semi")
    return tri.agg(F.count("*").alias("n_triangles"))


def transitivity(edges: DataFrame, a: str = "author1", b: str = "author2") -> DataFrame:
    """Global clustering coefficient = 3 * triangles / open+closed
    triplets (nx.transitivity semantics)."""
    und = _undirected(edges, a, b)
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    triplets = deg.agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("n_triplets"))
    tri = triangle_count(edges, a, b)
    return tri.crossJoin(triplets).select(
        F.when(
            F.col("n_triplets") > 0,
            F.round(3.0 * F.col("n_triangles") / F.col("n_triplets"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("transitivity")
    )
