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


def community_metrics(
    weighted: DataFrame,
    membership: DataFrame,
    a: str = "author1",
    b: str = "author2",
    w: str = "weight",
    node_col: str = "node",
    comm_col: str = "community",
) -> DataFrame:
    """Partition quality stats (reference 05_community_extraction.py:
    101-108): weighted modularity (nx.community.modularity semantics)
    + unweighted coverage/performance (nx partition_quality). Pure
    column math over (edges ⋈ membership) — one shuffle each side.
    Self-loops are excluded (nx quality functions operate on the
    simple graph)."""
    e = weighted.select(
        F.col(a).alias("u"), F.col(b).alias("v"), F.col(w).cast("double").alias("wt")
    ).where(F.col(a) != F.col(b))
    m = membership.select(F.col(node_col).alias("node"), F.col(comm_col).alias("comm"))
    mu = m.select(F.col("node").alias("u"), F.col("comm").alias("cu"))
    mv = m.select(F.col("node").alias("v"), F.col("comm").alias("cv"))
    tagged = e.join(mu, "u").join(mv, "v").cache()

    totals = tagged.agg(
        F.sum("wt").alias("m2"),  # sum of edge weights (each edge once)
        F.count("*").alias("n_edges"),
        F.sum(F.when(F.col("cu") == F.col("cv"), F.col("wt")).otherwise(0.0)).alias("w_in"),
        F.sum((F.col("cu") == F.col("cv")).cast("int")).alias("e_in"),
    )
    # weighted degree per node (self-loop-free), then per community
    deg = (
        tagged.select(F.col("u").alias("node"), F.col("cu").alias("comm"), "wt")
        .unionAll(tagged.select(F.col("v").alias("node"), F.col("cv").alias("comm"), "wt"))
        .groupBy("node", "comm")
        .agg(F.sum("wt").alias("k"))
    )
    comm_tot = deg.groupBy("comm").agg(F.sum("k").alias("tot"))
    sum_tot2 = comm_tot.agg(F.sum(F.col("tot") * F.col("tot")).alias("sum_tot2"))
    sizes = m.groupBy("comm").agg(F.countDistinct("node").alias("sz"))
    n_nodes = m.select("node").distinct().count()
    intra_pairs = sizes.agg(F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("intra_pairs"))

    total_pairs = n_nodes * (n_nodes - 1) / 2.0
    out = totals.crossJoin(sum_tot2).crossJoin(intra_pairs)
    modularity = F.col("w_in") / F.col("m2") - F.col("sum_tot2") / (
        4.0 * F.col("m2") * F.col("m2")
    )
    coverage = F.col("e_in").cast("double") / F.col("n_edges")
    inter_pairs = F.lit(total_pairs) - F.col("intra_pairs")
    inter_edges = F.col("n_edges") - F.col("e_in")
    performance = (F.col("e_in") + (inter_pairs - inter_edges)) / F.lit(total_pairs)
    return out.select(
        F.round(modularity, 6).alias("modularity"),
        F.round(coverage, 6).alias("coverage"),
        F.round(performance, 6).alias("performance"),
    )


def community_metrics_sql(weighted_sql: str, membership_sql: str) -> str:
    return f"""
WITH e AS (
  SELECT author1 AS u, author2 AS v, CAST(weight AS DOUBLE) AS wt
  FROM ({weighted_sql}) WHERE author1 <> author2
),
m AS (SELECT node, community AS comm FROM ({membership_sql})),
tagged AS (
  SELECT e.u, e.v, e.wt, mu.comm AS cu, mv.comm AS cv
  FROM e JOIN m mu ON e.u = mu.node JOIN m mv ON e.v = mv.node
),
totals AS (
  SELECT sum(wt) AS m2, count(*) AS n_edges,
         sum(CASE WHEN cu = cv THEN wt ELSE 0.0 END) AS w_in,
         sum(CASE WHEN cu = cv THEN 1 ELSE 0 END) AS e_in
  FROM tagged
),
deg AS (
  SELECT node, comm, sum(wt) AS k FROM (
    SELECT u AS node, cu AS comm, wt FROM tagged
    UNION ALL SELECT v AS node, cv AS comm, wt FROM tagged
  ) GROUP BY 1, 2
),
comm_tot AS (SELECT comm, sum(k) AS tot FROM deg GROUP BY 1),
st AS (SELECT sum(tot * tot) AS sum_tot2 FROM comm_tot),
sizes AS (SELECT comm, count(DISTINCT node) AS sz FROM m GROUP BY 1),
np AS (SELECT count(DISTINCT node) AS n FROM m),
ip AS (SELECT sum(sz * (sz - 1) / 2) AS intra_pairs FROM sizes)
SELECT round(w_in / m2 - sum_tot2 / (4.0 * m2 * m2), 6) AS modularity,
       round(CAST(e_in AS DOUBLE) / n_edges, 6) AS coverage,
       round((e_in + ((n * (n - 1) / 2.0) - intra_pairs - (n_edges - e_in)))
             / (n * (n - 1) / 2.0), 6) AS performance
FROM totals, st, ip, np
"""


def louvain_communities(
    weighted: DataFrame,
    seed: int = 42,
    a: str = "author1",
    b: str = "author2",
    w: str = "weight",
    graph_col: str | None = None,
) -> DataFrame:
    """Louvain community detection (reference 05_community_extraction.
    py:60-63, networkx louvain seed=42).

    Spark strategy mirrors SURVEY §7 'hard part #1': communities are
    computed per (small, backboned) graph — so the per-graph solve
    runs as a seeded pure-Python Louvain inside ONE ``applyInPandas``
    group (vectorized ingress/egress, driver untouched), while many
    graphs (per interval) parallelize across the cluster. Output:
    (graph, node, community) with community = min member node id.

    The implementation is a from-scratch two-phase Louvain (local
    moves + aggregation), deterministic under ``seed``; it matches
    networkx in structure, not necessarily in the exact partition
    (tie-breaking differs), which the reference itself does not pin
    (its stability study runs unseeded, 06:71)."""
    import pandas as pd

    gcol = graph_col or "__g"
    e = weighted.select(
        (F.col(graph_col) if graph_col else F.lit("all")).alias("g"),
        F.col(a).alias("u"),
        F.col(b).alias("v"),
        F.col(w).cast("double").alias("wt"),
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf["g"].iloc[0]
        comm = _louvain_python(
            list(zip(pdf["u"], pdf["v"], pdf["wt"])), seed=seed
        )
        return pd.DataFrame(
            {"graph": g, "node": list(comm), "community": [comm[n] for n in comm]}
        )

    out_schema = "graph string, node long, community long"
    return e.groupBy("g").applyInPandas(lambda key, p: solve(p), schema=out_schema)


def _louvain_python(edges: list[tuple], seed: int = 42) -> dict:
    """Seeded two-phase Louvain over an undirected weighted edge list.
    Returns node → community id (min original member)."""
    from collections import defaultdict

    adj: dict = defaultdict(dict)
    for u, v, wt in edges:
        if u == v:
            continue
        u, v, wt = int(u), int(v), float(wt)
        adj[u][v] = adj[u].get(v, 0.0) + wt
        adj[v][u] = adj[v].get(u, 0.0) + wt

    # each meta-node tracks its original members; selfw = double-counted
    # internal weight of a meta-node (Louvain's meta self-loop)
    members = {n: {n} for n in adj}
    selfw = {n: 0.0 for n in adj}
    node2comm_final: dict = {}
    rng_state = seed & 0x7FFFFFFF or 1

    def lcg_shuffle(items: list) -> list:
        nonlocal rng_state
        arr = list(items)
        for i in range(len(arr) - 1, 0, -1):
            rng_state = (1103515245 * rng_state + 12345) % (1 << 31)
            j = rng_state % (i + 1)
            arr[i], arr[j] = arr[j], arr[i]
        return arr

    while True:
        m2 = sum(sum(nb.values()) for nb in adj.values()) + sum(selfw.values())  # = 2m
        if m2 == 0:
            break
        comm = {n: n for n in adj}
        k = {n: sum(nb.values()) + selfw[n] for n, nb in adj.items()}
        sigma_tot = dict(k)
        improved = True
        any_move = False
        while improved:
            improved = False
            for n in lcg_shuffle(sorted(adj)):
                cn = comm[n]
                sigma_tot[cn] -= k[n]
                links = defaultdict(float)
                for nb, wt in adj[n].items():
                    links[comm[nb]] += wt
                best_c, best_gain = cn, links.get(cn, 0.0) - sigma_tot[cn] * k[n] / m2
                for c, l_nc in sorted(links.items()):
                    gain = l_nc - sigma_tot[c] * k[n] / m2
                    if gain > best_gain + 1e-12:
                        best_c, best_gain = c, gain
                sigma_tot[best_c] += k[n]
                comm[n] = best_c
                if best_c != cn:
                    improved = True
                    any_move = True
        if not any_move:
            break
        # aggregate: new meta-nodes = communities; intra weight becomes
        # the meta self-loop (kept — dropping it over-merges)
        new_adj: dict = defaultdict(dict)
        new_members: dict = defaultdict(set)
        new_selfw: dict = defaultdict(float)
        for n, c in comm.items():
            new_members[c] |= members[n]
            new_selfw[c] += selfw[n]
        for u, nb in adj.items():
            for v, wt in nb.items():
                cu, cv = comm[u], comm[v]
                if cu == cv:
                    new_selfw[cu] += wt  # directed iteration double-counts
                else:
                    new_adj[cu][cv] = new_adj[cu].get(cv, 0.0) + wt
        members = {c: s for c, s in new_members.items()}
        selfw = {c: new_selfw[c] for c in members}
        if not new_adj:  # everything merged into isolated communities
            break
        adj = new_adj
        # isolated aggregated communities keep existing
        for c in members:
            adj.setdefault(c, {})

    for c, mem in members.items():
        label = min(mem)
        for n in mem:
            node2comm_final[n] = label
    return node2comm_final


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
