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


def with_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8, dim: int = 64, seed: int = 42
) -> DataFrame:
    from openalex_collaboration_crawler_spark.operators import ensure_parallelism

    df = ensure_parallelism(df)
    return df.withColumn("bucket", lsh_bucket(F.col(vec_col), n_planes, dim, seed))


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
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket.

    Recall < 1.0 by design; the oracle reproduces the same bucketing so
    results are still deterministic and differential-testable."""
    c = with_lsh_bucket(corpus, vec_col, n_planes, dim)
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
) -> str:
    cb = lsh_bucket_sql(f"c.{vec_col}", n_planes, dim)
    qb = lsh_bucket_sql("q.query_vec", n_planes, dim)
    sim = cosine_sql(f"c.{vec_col}", "q.query_vec")
    return f"""
WITH q AS ({queries_sql}),
scored AS (
  SELECT q.query_id AS query_id, c.{id_col} AS vec_id, {sim} AS sim_raw
  FROM {corpus_table} c JOIN q ON {cb} = {qb}
),
ranked AS (
  SELECT query_id, vec_id, sim_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(sim_raw, 6) AS sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Pairs (a<b) in the same LSH bucket with cosine ≥ threshold."""
    e = with_lsh_bucket(embeddings, vec_col, n_planes, dim)
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
) -> str:
    xb = lsh_bucket_sql(f"x.{vec_col}", n_planes, dim)
    yb = lsh_bucket_sql(f"y.{vec_col}", n_planes, dim)
    sim = cosine_sql(f"x.{vec_col}", f"y.{vec_col}")
    return f"""
SELECT x.{id_col} AS a, y.{id_col} AS b, round({sim}, 6) AS sim
FROM {table} x JOIN {table} y
  ON {xb} = {yb} AND x.{id_col} < y.{id_col}
WHERE {sim} >= {threshold}
"""
