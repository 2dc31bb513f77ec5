"""Analytics operators (reference analysis/ scripts, SURVEY §2.4-2.5).

Degree statistics, CCDF, top-K-per-group, first-seen dedup, lost
nodes, community overlap and sessionization — each a single
declarative DataFrame plan with map-side partial aggregation and at
most one shuffle on the natural key.

Reference provenance per operator is cited in docstrings
(file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def degrees(edges: DataFrame, a_col: str = "author1", b_col: str = "author2") -> DataFrame:
    """Undirected degree per node from a weighted-edge table; self-loops
    count once (networkx semantics in compute_structural_statistics.py:7-30).
    """
    # one Generate instead of a plan-level unionAll: Catalyst does not
    # deduplicate common subplans, so the union form planned+executed
    # the (expensive) edge subtree twice (r6, guide §2.4)
    ends = edges.select(
        F.explode(
            F.when(
                F.col(a_col) != F.col(b_col), F.array(F.col(a_col), F.col(b_col))
            ).otherwise(F.array(F.col(a_col)))
        ).alias("node")
    )
    return ends.groupBy("node").agg(F.count("*").alias("degree"))


def degrees_sql(edges_sql: str, a_col: str = "author1", b_col: str = "author2") -> str:
    return f"""
WITH e AS ({edges_sql}),
ends AS (
  SELECT {a_col} AS node FROM e
  UNION ALL
  SELECT {b_col} AS node FROM e WHERE {a_col} <> {b_col}
)
SELECT node, count(*) AS degree FROM ends GROUP BY node
"""


def degree_stats(edges: DataFrame, a_col: str = "author1", b_col: str = "author2") -> DataFrame:
    """min/max/mean/median/std of the degree sequence + node/edge counts
    (compute_structural_statistics.py:13-35). Exact percentile (not
    approx) so the oracle matches; stddev computed from exact integer
    sums via one closed-form expression → bit-identical doubles."""
    d = degrees(edges, a_col, b_col)
    s = d.agg(
        F.count("*").alias("n_nodes"),
        F.sum("degree").alias("sum_d"),
        F.sum(F.col("degree") * F.col("degree")).alias("sum_d2"),
        F.min("degree").alias("min_degree"),
        F.max("degree").alias("max_degree"),
        F.expr("percentile(degree, 0.5)").alias("median_degree"),
    )
    mean = F.col("sum_d").cast("double") / F.col("n_nodes").cast("double")
    var = (
        F.col("sum_d2").cast("double")
        - F.col("sum_d").cast("double") * F.col("sum_d").cast("double") / F.col("n_nodes").cast("double")
    ) / F.col("n_nodes").cast("double")
    return s.select(
        "n_nodes",
        "min_degree",
        "max_degree",
        F.round(mean, 6).alias("mean_degree"),
        F.round(F.sqrt(var), 6).alias("std_degree"),
        F.round(F.col("median_degree"), 6).alias("median_degree"),
    )


def degree_stats_sql(edges_sql: str, a_col: str = "author1", b_col: str = "author2") -> str:
    d = degrees_sql(edges_sql, a_col, b_col)
    mean = "CAST(sum_d AS DOUBLE) / CAST(n_nodes AS DOUBLE)"
    var = (
        "(CAST(sum_d2 AS DOUBLE) - CAST(sum_d AS DOUBLE) * CAST(sum_d AS DOUBLE)"
        " / CAST(n_nodes AS DOUBLE)) / CAST(n_nodes AS DOUBLE)"
    )
    return f"""
WITH d AS ({d}),
s AS (
  SELECT count(*) AS n_nodes, sum(degree) AS sum_d, sum(degree * degree) AS sum_d2,
         min(degree) AS min_degree, max(degree) AS max_degree,
         quantile_cont(degree, 0.5) AS median_degree
  FROM d
)
SELECT n_nodes, min_degree, max_degree,
       round({mean}, 6) AS mean_degree,
       round(sqrt({var}), 6) AS std_degree,
       round(median_degree, 6) AS median_degree
FROM s
"""


def ccdf(edges: DataFrame, a_col: str = "author1", b_col: str = "author2") -> DataFrame:
    """Complementary-CDF of the degree distribution
    (01_metadata_analysis.py:455-463): for each degree value, the
    count of nodes with degree ≥ it. Reverse-cumulative window over
    the (small) degree histogram — the heavy agg happens first."""
    hist = degrees(edges, a_col, b_col).groupBy("degree").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("degree")).rowsBetween(Window.unboundedPreceding, 0)
    return hist.select(
        "degree", F.sum("n").over(w).cast("long").alias("n_ge")
    ).orderBy("degree")


def ccdf_sql(edges_sql: str, a_col: str = "author1", b_col: str = "author2") -> str:
    d = degrees_sql(edges_sql, a_col, b_col)
    return f"""
WITH d AS ({d}),
hist AS (SELECT degree, count(*) AS n FROM d GROUP BY degree)
SELECT degree,
       CAST(sum(n) OVER (ORDER BY degree DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_ge
FROM hist ORDER BY degree
"""


def topk_per_group(
    df: DataFrame, group_col: str, item_col: str, k: int = 10
) -> DataFrame:
    """Top-K items by count within each group, ties broken by item asc
    (row_number, not rank — reference uses rank(method='first'),
    01_A_plot_openalex_ontology.py:49 / top-K slice
    01_metadata_analysis.py:351-357)."""
    counts = df.groupBy(group_col, item_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc(item_col))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group_col, item_col, "n", "rank")
    )


def topk_per_group_sql(table_sql: str, group_col: str, item_col: str, k: int = 10) -> str:
    return f"""
WITH counts AS (
  SELECT {group_col}, {item_col}, count(*) AS n FROM ({table_sql}) GROUP BY 1, 2
)
SELECT {group_col}, {item_col}, n, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY {group_col} ORDER BY n DESC, {item_col} ASC) AS rank
  FROM counts
) WHERE rank <= {k}
"""


def first_seen(
    df: DataFrame, key_col: str, order_col: str
) -> DataFrame:
    """First occurrence per key (12_new_author_distribution.py:61-83) —
    the relational form of the crawl seen-set: row_number()=1 over
    (key, order). One shuffle on key; ties on order broken by the
    order value itself (stable because fixture orders are unique)."""
    w = Window.partitionBy(key_col).orderBy(F.asc(order_col))
    return (
        df.select(key_col, order_col)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col(key_col), F.col(order_col).alias("first_" + order_col))
    )


def first_seen_sql(table_sql: str, key_col: str, order_col: str) -> str:
    return f"""
SELECT {key_col}, {order_col} AS first_{order_col} FROM (
  SELECT {key_col}, {order_col},
         row_number() OVER (PARTITION BY {key_col} ORDER BY {order_col} ASC) AS rn
  FROM ({table_sql})
) WHERE rn = 1
"""


def lost_nodes(
    membership: DataFrame, interval_col: str = "interval", node_col: str = "node"
) -> DataFrame:
    """Per consecutive interval pair: how many nodes of interval i do
    not appear in interval i+1 (07_community_flow.py:251-273) —
    anti-join per pair expressed as one self-join + count."""
    ivs = membership.select(interval_col).distinct()
    w = Window.orderBy(interval_col)
    pairs = ivs.select(
        F.col(interval_col).alias("iv_before"),
        F.lead(interval_col).over(w).alias("iv_after"),
    ).where(F.col("iv_after").isNotNull())
    before = membership.select(
        F.col(interval_col).alias("iv_before"), F.col(node_col).alias("node")
    ).distinct()
    after = membership.select(
        F.col(interval_col).alias("iv_after"), F.col(node_col).alias("node")
    ).distinct()
    joined = (
        before.join(pairs, "iv_before")
        .join(after, ["iv_after", "node"], "left_anti")
        .groupBy("iv_before", "iv_after")
        .agg(F.count("*").alias("n_lost"))
    )
    totals = before.groupBy("iv_before").agg(F.count("*").alias("n_before"))
    return joined.join(totals, "iv_before").select(
        "iv_before",
        "iv_after",
        "n_lost",
        F.round(F.col("n_lost").cast("double") / F.col("n_before").cast("double"), 6).alias(
            "lost_frac"
        ),
    )


def lost_nodes_sql(membership_sql: str, interval_col: str = "interval", node_col: str = "node") -> str:
    return f"""
WITH m AS (SELECT DISTINCT {interval_col} AS iv, {node_col} AS node FROM ({membership_sql})),
ivs AS (SELECT DISTINCT iv FROM m),
pairs AS (
  SELECT iv AS iv_before, lead(iv) OVER (ORDER BY iv) AS iv_after FROM ivs
),
lost AS (
  SELECT p.iv_before, p.iv_after, count(*) AS n_lost
  FROM m b JOIN pairs p ON b.iv = p.iv_before
  WHERE p.iv_after IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM m a WHERE a.iv = p.iv_after AND a.node = b.node)
  GROUP BY 1, 2
),
totals AS (SELECT iv AS iv_before, count(*) AS n_before FROM m GROUP BY 1)
SELECT l.iv_before, l.iv_after, l.n_lost,
       round(CAST(l.n_lost AS DOUBLE) / CAST(t.n_before AS DOUBLE), 6) AS lost_frac
FROM lost l JOIN totals t USING (iv_before)
"""


def community_overlap(
    membership: DataFrame,
    interval_col: str = "interval",
    comm_col: str = "community",
    node_col: str = "node",
) -> DataFrame:
    """Flow matrix between consecutive-interval communities
    (07_community_flow.py:186-190, 240-249): |A∩B| / |A| via one
    self-join on node — replaces the reference's O(|C|²) nested
    set-intersection loop with a single shuffle."""
    m = membership.select(
        F.col(interval_col).alias("iv"),
        F.col(comm_col).alias("comm"),
        F.col(node_col).alias("node"),
    ).distinct()
    ivs = m.select("iv").distinct()
    w = Window.orderBy("iv")
    pairs = ivs.select(
        F.col("iv").alias("iv_before"), F.lead("iv").over(w).alias("iv_after")
    ).where(F.col("iv_after").isNotNull())
    before = m.select(
        F.col("iv").alias("iv_before"),
        F.col("comm").alias("comm_before"),
        "node",
    )
    after = m.select(
        F.col("iv").alias("iv_after"), F.col("comm").alias("comm_after"), "node"
    )
    inter = (
        before.join(pairs, "iv_before")
        .join(after, ["iv_after", "node"])
        .groupBy("iv_before", "iv_after", "comm_before", "comm_after")
        .agg(F.count("*").alias("n_common"))
    )
    sizes = before.groupBy("iv_before", "comm_before").agg(F.count("*").alias("sz_before"))
    return inter.join(sizes, ["iv_before", "comm_before"]).select(
        "iv_before",
        "iv_after",
        "comm_before",
        "comm_after",
        "n_common",
        F.round(F.col("n_common").cast("double") / F.col("sz_before").cast("double"), 6).alias(
            "flow"
        ),
    )


def community_overlap_sql(
    membership_sql: str,
    interval_col: str = "interval",
    comm_col: str = "community",
    node_col: str = "node",
) -> str:
    return f"""
WITH m AS (SELECT DISTINCT {interval_col} AS iv, {comm_col} AS comm, {node_col} AS node
           FROM ({membership_sql})),
ivs AS (SELECT DISTINCT iv FROM m),
pairs AS (SELECT iv AS iv_before, lead(iv) OVER (ORDER BY iv) AS iv_after FROM ivs),
inter AS (
  SELECT p.iv_before, p.iv_after, b.comm AS comm_before, a.comm AS comm_after,
         count(*) AS n_common
  FROM m b
  JOIN pairs p ON b.iv = p.iv_before AND p.iv_after IS NOT NULL
  JOIN m a ON a.iv = p.iv_after AND a.node = b.node
  GROUP BY 1, 2, 3, 4
),
sizes AS (SELECT iv AS iv_before, comm AS comm_before, count(*) AS sz_before
          FROM m GROUP BY 1, 2)
SELECT i.iv_before, i.iv_after, i.comm_before, i.comm_after, i.n_common,
       round(CAST(i.n_common AS DOUBLE) / CAST(s.sz_before AS DOUBLE), 6) AS flow
FROM inter i JOIN sizes s USING (iv_before, comm_before)
"""


def community_works(
    edges: DataFrame,
    membership: DataFrame,
    interval_col: str = "interval",
    comm_col: str = "community",
    node_col: str = "node",
) -> DataFrame:
    """J2 (/root/reference/analysis/07_community_flow.py:63-100):
    recover the work ids each community spans — a work belongs to a
    community when BOTH endpoint authors of one of its edges are in
    that community (the reference materializes works[(a1,a2)] then
    probes every author pair of the community; here it is two equi-
    joins + a distinct, one shuffle each, no O(|community|²) loop).

    edges: (interval, work_id, a1, a2); self-pairs are excluded
    (ref get_works_from_community skips first == second).
    Output: (interval, community, work_id) distinct."""
    e = edges.where(F.col("a1") != F.col("a2"))
    m1 = membership.select(
        F.col(interval_col).alias("interval"),
        F.col(node_col).alias("a1"),
        F.col(comm_col).alias("c1"),
    )
    m2 = membership.select(
        F.col(interval_col).alias("interval"),
        F.col(node_col).alias("a2"),
        F.col(comm_col).alias("c2"),
    )
    return (
        e.join(m1, ["interval", "a1"])
        .join(m2, ["interval", "a2"])
        .where(F.col("c1") == F.col("c2"))
        .select("interval", F.col("c1").alias("community"), "work_id")
        .distinct()
    )


def community_works_sql(
    edges_sql: str,
    membership_sql: str,
    interval_col: str = "interval",
    comm_col: str = "community",
    node_col: str = "node",
) -> str:
    return f"""
SELECT DISTINCT e.interval, m1.{comm_col} AS community, e.work_id
FROM ({edges_sql}) e
JOIN ({membership_sql}) m1
  ON m1.{interval_col} = e.interval AND m1.{node_col} = e.a1
JOIN ({membership_sql}) m2
  ON m2.{interval_col} = e.interval AND m2.{node_col} = e.a2
WHERE e.a1 <> e.a2 AND m1.{comm_col} = m2.{comm_col}
"""


def community_topic_counts(
    edges: DataFrame,
    membership: DataFrame,
    work_topics: DataFrame,
    delete_list: DataFrame | None = None,
) -> DataFrame:
    """J3 (/root/reference/analysis/07_community_flow.py:104-119):
    per-community topic histogram over the community's recovered
    works, minus the delete-list noise labels
    (mappings.application_domains_to_delete applied at 07:115-118).

    work_topics: (work_id, topic) already exploded. Output:
    (interval, community, topic, n)."""
    cw = community_works(edges, membership)
    counts = (
        cw.join(work_topics.select("work_id", "topic"), "work_id")
        .groupBy("interval", "community", "topic")
        .agg(F.count("*").alias("n"))
    )
    if delete_list is None:
        from openalex_collaboration_crawler_spark.operators.topics import _lists_to_dfs

        delete_list, _, _ = _lists_to_dfs(edges.sparkSession, None, None, None)
    return counts.join(
        F.broadcast(delete_list.select(F.col("label").alias("topic"))), "topic", "left_anti"
    ).select("interval", "community", "topic", "n")


def community_topic_counts_sql(
    edges_sql: str,
    membership_sql: str,
    work_topics_sql: str,
    delete_list: list[str] | None = None,
) -> str:
    from openalex_collaboration_crawler_spark.operators.topics import DEFAULT_DELETE_LIST

    dl = delete_list if delete_list is not None else DEFAULT_DELETE_LIST
    cw = community_works_sql(edges_sql, membership_sql)
    if dl:
        dl_vals = ", ".join(f"('{x.replace(chr(39), chr(39) * 2)}')" for x in dl)
        # NOT EXISTS, not NOT IN: an empty/NULL-bearing list under NOT IN
        # yields no rows at all (NULL semantics) — the opposite of the
        # Spark side's "empty list filters nothing".
        dl_cte = f"dl(label) AS (VALUES {dl_vals}),"
        dl_where = "WHERE NOT EXISTS (SELECT 1 FROM dl WHERE dl.label = counts.topic)"
    else:
        dl_cte = ""
        dl_where = ""
    return f"""
WITH cw AS ({cw}),
{dl_cte}
counts AS (
  SELECT cw.interval, cw.community, t.topic, count(*) AS n
  FROM cw JOIN ({work_topics_sql}) t USING (work_id)
  GROUP BY 1, 2, 3
)
SELECT interval, community, topic, n FROM counts
{dl_where}
"""


def community_size_split(
    membership: DataFrame,
    pct: float = 0.99,
    comm_col: str = "community",
    node_col: str = "node",
) -> DataFrame:
    """A10+A11 (07_community_flow.py:146-184): exact size percentile
    threshold; communities at/above it keep their id, the rest merge
    into a 'sink' pseudo-community. Output: (community_label, n_nodes,
    n_communities)."""
    sizes = membership.groupBy(F.col(comm_col).alias("comm")).agg(
        F.countDistinct(node_col).alias("sz")
    )
    thr = sizes.agg(F.expr(f"percentile(sz, {pct})").alias("t"))
    labeled = sizes.crossJoin(F.broadcast(thr)).select(
        F.when(F.col("sz") >= F.col("t"), F.col("comm").cast("string"))
        .otherwise(F.lit("sink"))
        .alias("community_label"),
        "sz",
    )
    return labeled.groupBy("community_label").agg(
        F.sum("sz").cast("long").alias("n_nodes"), F.count("*").alias("n_communities")
    )


def community_size_split_sql(
    membership_sql: str, pct: float = 0.99, comm_col: str = "community", node_col: str = "node"
) -> str:
    return f"""
WITH sizes AS (
  SELECT {comm_col} AS comm, count(DISTINCT {node_col}) AS sz
  FROM ({membership_sql}) GROUP BY 1
),
thr AS (SELECT quantile_cont(sz, {pct}) AS t FROM sizes),
labeled AS (
  SELECT CASE WHEN s.sz >= thr.t THEN CAST(s.comm AS VARCHAR) ELSE 'sink' END
           AS community_label, s.sz
  FROM sizes s, thr
)
SELECT community_label, CAST(sum(sz) AS BIGINT) AS n_nodes,
       count(*) AS n_communities
FROM labeled GROUP BY 1
"""


def nmi(
    a: DataFrame,
    b: DataFrame,
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Normalized mutual information between two labelings of the same
    node set (06_community_stability.py:67-104 uses sklearn NMI with
    arithmetic-mean normalization; here: contingency groupBy + entropy
    column math — one shuffle, no sklearn).

    NMI = 2·I(A;B) / (H(A) + H(B)); identical labelings → 1.0."""
    aa = a.select(F.col(node_col).alias("node"), F.col(label_col).alias("la"))
    bb = b.select(F.col(node_col).alias("node"), F.col(label_col).alias("lb"))
    joint = aa.join(bb, "node")
    n = joint.count()
    if n == 0:
        raise ValueError("empty node intersection")
    cont = joint.groupBy("la", "lb").agg(F.count("*").alias("nij"))
    pa = cont.groupBy("la").agg(F.sum("nij").alias("ni"))
    pb = cont.groupBy("lb").agg(F.sum("nij").alias("nj"))
    ln = F.log
    mi_terms = (
        cont.join(pa, "la")
        .join(pb, "lb")
        .select(
            (
                (F.col("nij") / F.lit(n))
                * ln(F.lit(n) * F.col("nij") / (F.col("ni") * F.col("nj")))
            ).alias("term")
        )
    )
    mi = mi_terms.agg(F.sum("term").alias("mi"))
    ha = pa.select(((F.col("ni") / F.lit(n)) * ln(F.col("ni") / F.lit(n))).alias("t")).agg(
        (-F.sum("t")).alias("ha")
    )
    hb = pb.select(((F.col("nj") / F.lit(n)) * ln(F.col("nj") / F.lit(n))).alias("t")).agg(
        (-F.sum("t")).alias("hb")
    )
    return (
        mi.crossJoin(ha)
        .crossJoin(hb)
        .select(
            F.when(F.col("ha") + F.col("hb") > 0, F.round(2 * F.col("mi") / (F.col("ha") + F.col("hb")), 6))
            .otherwise(F.lit(1.0))
            .alias("nmi")
        )
    )


def nmi_sql(a_sql: str, b_sql: str, node_col: str = "node", label_col: str = "label") -> str:
    return f"""
WITH aa AS (SELECT {node_col} AS node, {label_col} AS la FROM ({a_sql})),
bb AS (SELECT {node_col} AS node, {label_col} AS lb FROM ({b_sql})),
joint AS (SELECT aa.la, bb.lb FROM aa JOIN bb USING (node)),
tot AS (SELECT count(*) AS n FROM joint),
cont AS (SELECT la, lb, count(*) AS nij FROM joint GROUP BY 1, 2),
pa AS (SELECT la, sum(nij) AS ni FROM cont GROUP BY 1),
pb AS (SELECT lb, sum(nij) AS nj FROM cont GROUP BY 1),
mi AS (
  SELECT sum((CAST(nij AS DOUBLE) / n) * ln(n * CAST(nij AS DOUBLE) / (ni * nj))) AS mi
  FROM cont JOIN pa USING (la) JOIN pb USING (lb), tot
),
ha AS (SELECT -sum((CAST(ni AS DOUBLE) / n) * ln(CAST(ni AS DOUBLE) / n)) AS ha FROM pa, tot),
hb AS (SELECT -sum((CAST(nj AS DOUBLE) / n) * ln(CAST(nj AS DOUBLE) / n)) AS hb FROM pb, tot)
SELECT CASE WHEN ha + hb > 0 THEN round(2 * mi / (ha + hb), 6) ELSE 1.0 END AS nmi
FROM mi, ha, hb
"""


def pairwise_nmi_stats(
    mem: DataFrame,
    run_col: str = "run",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Community-stability ensemble statistics (reference
    06_community_stability.py:76-104): pairwise NMI between every pair
    of labelings (runs) of the same node universe, restricted per pair
    to the common nodes, then mean/std (population, np.std semantics)
    over the R·(R−1)/2 pair values.

    Distributed shape: ONE self-join on node with ``run_i < run_j``
    fans the membership table into per-pair contingency cells; all
    entropies/MI are per-pair aggregations — no driver loop over run
    pairs, so R runs over a 10^8-node graph cost one shuffle of
    n_nodes·R(R−1)/2 rows, partitioned by (pair, labels). The
    reference's adjusted-NMI twin (AMI) needs the hypergeometric
    expected-MI correction and is intentionally not implemented.

    Returns one row: (n_runs, n_pairs, nmi_mean, nmi_std, nmi_min,
    nmi_max)."""
    m = mem.select(
        F.col(run_col).cast("long").alias("run"),
        F.col(node_col).alias("node"),
        F.col(label_col).alias("lab"),
    )
    a = m.select(F.col("run").alias("ri"), "node", F.col("lab").alias("la"))
    b = m.select(F.col("run").alias("rj"), "node", F.col("lab").alias("lb"))
    joint = a.join(b, "node").where(F.col("ri") < F.col("rj"))
    cont = joint.groupBy("ri", "rj", "la", "lb").agg(F.count("*").alias("nij"))
    pa = cont.groupBy("ri", "rj", "la").agg(F.sum("nij").alias("ni"))
    pb = cont.groupBy("ri", "rj", "lb").agg(F.sum("nij").alias("nj"))
    tot = cont.groupBy("ri", "rj").agg(F.sum("nij").alias("n"))
    ln = F.log
    per_pair = (
        cont.join(pa, ["ri", "rj", "la"])
        .join(pb, ["ri", "rj", "lb"])
        .join(tot, ["ri", "rj"])
        .groupBy("ri", "rj")
        .agg(
            F.sum(
                (F.col("nij") / F.col("n"))
                * ln(F.col("n") * F.col("nij") / (F.col("ni") * F.col("nj")))
            ).alias("mi")
        )
    )
    ha = (
        pa.join(tot, ["ri", "rj"])
        .groupBy("ri", "rj")
        .agg((-F.sum((F.col("ni") / F.col("n")) * ln(F.col("ni") / F.col("n")))).alias("ha"))
    )
    hb = (
        pb.join(tot, ["ri", "rj"])
        .groupBy("ri", "rj")
        .agg((-F.sum((F.col("nj") / F.col("n")) * ln(F.col("nj") / F.col("n")))).alias("hb"))
    )
    nmi_pairs = (
        per_pair.join(ha, ["ri", "rj"])
        .join(hb, ["ri", "rj"])
        .select(
            F.when(
                F.col("ha") + F.col("hb") > 0,
                2 * F.col("mi") / (F.col("ha") + F.col("hb")),
            )
            .otherwise(F.lit(1.0))
            .alias("nmi")
        )
    )
    return nmi_pairs.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg("nmi"), 6).alias("nmi_mean"),
        F.round(
            # clamp: the cancellation form can go a hair negative when
            # all pair values are equal-but-inexact → sqrt(NaN); np.std
            # (the reference) returns 0 there
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    F.avg(F.col("nmi") * F.col("nmi")) - F.avg("nmi") * F.avg("nmi"),
                )
            ),
            6,
        ).alias("nmi_std"),
        F.round(F.min("nmi"), 6).alias("nmi_min"),
        F.round(F.max("nmi"), 6).alias("nmi_max"),
    ).crossJoin(
        m.select(F.countDistinct("run").alias("n_runs"))
    ).select("n_runs", "n_pairs", "nmi_mean", "nmi_std", "nmi_min", "nmi_max")


def pairwise_nmi_stats_sql(
    mem_sql: str,
    run_col: str = "run",
    node_col: str = "node",
    label_col: str = "label",
) -> str:
    return f"""
WITH m AS (SELECT CAST({run_col} AS BIGINT) AS run, {node_col} AS node, {label_col} AS lab
           FROM ({mem_sql})),
joint AS (
  SELECT a.run AS ri, b.run AS rj, a.lab AS la, b.lab AS lb
  FROM m a JOIN m b ON a.node = b.node AND a.run < b.run
),
cont AS (SELECT ri, rj, la, lb, count(*) AS nij FROM joint GROUP BY 1, 2, 3, 4),
pa AS (SELECT ri, rj, la, sum(nij) AS ni FROM cont GROUP BY 1, 2, 3),
pb AS (SELECT ri, rj, lb, sum(nij) AS nj FROM cont GROUP BY 1, 2, 3),
tot AS (SELECT ri, rj, sum(nij) AS n FROM cont GROUP BY 1, 2),
mi AS (
  SELECT c.ri, c.rj,
         sum((CAST(nij AS DOUBLE) / n) * ln(n * CAST(nij AS DOUBLE) / (ni * nj))) AS mi
  FROM cont c JOIN pa USING (ri, rj, la) JOIN pb USING (ri, rj, lb) JOIN tot USING (ri, rj)
  GROUP BY 1, 2
),
ha AS (SELECT ri, rj, -sum((CAST(ni AS DOUBLE) / n) * ln(CAST(ni AS DOUBLE) / n)) AS ha
       FROM pa JOIN tot USING (ri, rj) GROUP BY 1, 2),
hb AS (SELECT ri, rj, -sum((CAST(nj AS DOUBLE) / n) * ln(CAST(nj AS DOUBLE) / n)) AS hb
       FROM pb JOIN tot USING (ri, rj) GROUP BY 1, 2),
pairs AS (
  SELECT CASE WHEN ha + hb > 0 THEN 2 * mi / (ha + hb) ELSE 1.0 END AS nmi
  FROM mi JOIN ha USING (ri, rj) JOIN hb USING (ri, rj)
),
nr AS (SELECT count(DISTINCT run) AS n_runs FROM m)
SELECT (SELECT n_runs FROM nr) AS n_runs, count(*) AS n_pairs,
       round(avg(nmi), 6) AS nmi_mean,
       round(sqrt(greatest(0.0, avg(nmi * nmi) - avg(nmi) * avg(nmi))), 6) AS nmi_std,
       round(min(nmi), 6) AS nmi_min,
       round(max(nmi), 6) AS nmi_max
FROM pairs
"""


def topk_pivot(
    df: DataFrame, group_col: str, item_col: str, k: int = 3
) -> DataFrame:
    """A7/W4 (01_A_plot_openalex_ontology.py:45-59): rank items per
    group (row_number — rank(method='first') semantics) and pivot the
    top-K ranks into columns rank_1..rank_K."""
    ranked = topk_per_group(df, group_col, item_col, k)
    return (
        ranked.groupBy(group_col)
        .pivot("rank", list(range(1, k + 1)))
        .agg(F.first(item_col))
        .toDF(group_col, *[f"rank_{i}" for i in range(1, k + 1)])
    )


def topk_pivot_sql(table_sql: str, group_col: str, item_col: str, k: int = 3) -> str:
    inner = topk_per_group_sql(table_sql, group_col, item_col, k)
    cols = ", ".join(
        f"max(CASE WHEN rank = {i} THEN {item_col} END) AS rank_{i}" for i in range(1, k + 1)
    )
    return f"SELECT {group_col}, {cols} FROM ({inner}) GROUP BY {group_col}"


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from
    the previous event of the same user exceeds ``gap_minutes``.
    lag + conditional cumsum — the standard one-shuffle formulation.
    Output: per-session (user_id, session_id, n_events, t_start, t_end)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    marked = events.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts")
    ).withColumn(
        "new_session",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > gap_s, 1
        )
        .otherwise(0)
        .cast("long"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    sess = marked.withColumn("session_id", F.sum("new_session").over(w2))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
    )


def sessionize_sql(table: str, user_col: str = "user_id", ts_col: str = "ts", gap_minutes: int = 30) -> str:
    gap_s = gap_minutes * 60
    return f"""
WITH marked AS (
  SELECT {user_col} AS user_id, {ts_col} AS ts,
         CASE WHEN epoch(date_trunc('second', {ts_col})) -
                   epoch(date_trunc('second', lag({ts_col}) OVER
              (PARTITION BY {user_col} ORDER BY {ts_col}))) > {gap_s}
              THEN 1 ELSE 0 END AS new_session
  FROM {table}
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS n_events, min(ts) AS t_start, max(ts) AS t_end
FROM sess GROUP BY 1, 2
"""
