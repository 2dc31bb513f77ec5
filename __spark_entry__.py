"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (weighted collaboration graph,
reference openalex_graph semantics) on sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2 +
training-data ops); each takes (spark, sf_dir) → DataFrame.
``oracle_sql()`` — equivalent DuckDB SQL per query, same column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openalex_collaboration_crawler_spark.functions import text as TX
from openalex_collaboration_crawler_spark.functions import url as URL
from openalex_collaboration_crawler_spark.operators import analytics as AN
from openalex_collaboration_crawler_spark.operators import dedup as DD
from openalex_collaboration_crawler_spark.operators import edges as ED
from openalex_collaboration_crawler_spark.operators import similarity as SIM
from openalex_collaboration_crawler_spark.sources.tables import (
    COLLAB_MODEL_SQL,
    collab_model,
    load_table,
)

SF001 = "/root/testdata/sf0.001"

INTERVALS = [(None, 1995), (1994, 1996), (1996, None)]  # overlapping + open ends

_EDGES_SQL = ED.PAIRWISE_EDGES_SQL_TEMPLATE.format(authorships=COLLAB_MODEL_SQL)
_WEIGHTED_SQL = ED.WEIGHTED_EDGES_SQL_TEMPLATE.format(edges=_EDGES_SQL)

_MEMBERSHIP_SQL = f"""
SELECT c.year AS interval, s.s_nationkey AS community, c.author AS node
FROM ({COLLAB_MODEL_SQL}) c JOIN supplier s ON c.author = s.s_suppkey
"""

_QUERIES_VEC_SQL = (
    "SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 8"
)

_SYNTH_URL_SQL = (
    "SELECT doc_id, ('http://Host' || CAST(doc_id % 37 AS VARCHAR) || '.Example.COM:80/p/'"
    " || CAST(doc_id AS VARCHAR) || '/?b=' || CAST(doc_id % 3 AS VARCHAR)"
    " || '&a=1#frag') AS url FROM documents"
)


def _synth_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic messy URLs derived from documents (canonicalization
    exercise: mixed case, default port, unsorted query, fragment)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("http://Host"),
            (F.col("doc_id") % 37).cast("string"),
            F.lit(".Example.COM:80/p/"),
            F.col("doc_id").cast("string"),
            F.lit("/?b="),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("&a=1#frag"),
        ).alias("url"),
    )


# --------------------------------------------------------------- queries


def _q_pairwise_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ED.pairwise_edges(collab_model(spark, sf_dir))


def _q_weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ED.weighted_edges(ED.pairwise_edges(collab_model(spark, sf_dir)))


def _q_interval_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = ED.pairwise_edges(collab_model(spark, sf_dir))
    return (
        ED.route_to_intervals(edges, INTERVALS)
        .groupBy("interval")
        .agg(F.count("*").alias("n_edges"))
    )


def _q_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AN.degree_stats(ED.weighted_edges(ED.pairwise_edges(collab_model(spark, sf_dir))))


def _q_ccdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AN.ccdf(ED.weighted_edges(ED.pairwise_edges(collab_model(spark, sf_dir))))


def _q_topk_parts_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    df = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.year("o_orderdate").alias("year"), F.col("p_type").alias("topic"))
    )
    return AN.topk_per_group(df, "year", "topic", k=5)


def _q_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AN.first_seen(collab_model(spark, sf_dir), "author", "year")


def _q_lost_authors(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        collab_model(spark, sf_dir)
        .join(
            load_table(spark, sf_dir, "supplier"),
            F.col("author") == F.col("s_suppkey"),
        )
        .select(
            F.col("year").alias("interval"),
            F.col("s_nationkey").alias("community"),
            F.col("author").alias("node"),
        )
    )
    return AN.lost_nodes(m)


def _q_community_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        collab_model(spark, sf_dir)
        .join(
            load_table(spark, sf_dir, "supplier"),
            F.col("author") == F.col("s_suppkey"),
        )
        .select(
            F.col("year").alias("interval"),
            F.col("s_nationkey").alias("community"),
            F.col("author").alias("node"),
        )
    )
    return AN.community_overlap(m)


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return AN.sessionize(load_table(spark, sf_dir, "events"))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.exact_dup_groups(load_table(spark, sf_dir, "documents"))


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count("text").alias("n_tok"),
        TX.punct_count("text").alias("n_punct"),
        TX.stopword_count("text").alias("n_stop"),
        TX.quality_score("text").alias("quality"),
        TX.lang_id("text").alias("lang_pred"),
        TX.fingerprint("text").alias("fp"),
    )


def _q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.minhash_candidate_pairs(load_table(spark, sf_dir, "documents"))


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.6).select(
        "a", "b", F.round("jaccard", 6).alias("jaccard")
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash(load_table(spark, sf_dir, "documents"))


def _q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash_neardup_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3)


def _queries_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(emb, _queries_vec(spark, sf_dir), k=5)


def _q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.lsh_topk(emb, _queries_vec(spark, sf_dir), k=5)


def _q_lsh_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.lsh_bucket_histogram(load_table(spark, sf_dir, "embeddings"))


def _q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.embedding_neardup_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.9)


def _q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _synth_urls(spark, sf_dir)
    return u.select(
        "doc_id",
        URL.canonicalize_url("url").alias("canonical_url"),
        URL.url_hash("url").alias("url_hash"),
        URL.url_host("url").alias("host"),
    )


def _q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped agg — exercises decimal-exact sums + multi-agg."""
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count("*").alias("count_order"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pairwise_edges": _q_pairwise_edges,
        "weighted_edges": _q_weighted_edges,
        "interval_routing": _q_interval_routing,
        "degree_stats": _q_degree_stats,
        "ccdf": _q_ccdf,
        "topk_parts_per_year": _q_topk_parts_per_year,
        "first_seen": _q_first_seen,
        "lost_authors": _q_lost_authors,
        "community_overlap": _q_community_overlap,
        "sessionize": _q_sessionize,
        "dedup_exact": _q_dedup_exact,
        "text_stats": _q_text_stats,
        "minhash_candidates": _q_minhash_candidates,
        "ngram_jaccard": _q_ngram_jaccard,
        "simhash": _q_simhash,
        "simhash_neardup": _q_simhash_neardup,
        "ann_topk": _q_ann_topk,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "lsh_histogram": _q_lsh_histogram,
        "embedding_neardup": _q_embedding_neardup,
        "url_canonicalize": _q_url_canonicalize,
        "tpch_pricing_summary": _q_tpch_pricing_summary,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pairwise_edges": _EDGES_SQL,
        "weighted_edges": _WEIGHTED_SQL,
        "interval_routing": f"""
SELECT {ED.first_interval_sql('year', INTERVALS)} AS interval, count(*) AS n_edges
FROM ({_EDGES_SQL}) WHERE {ED.first_interval_sql('year', INTERVALS)} IS NOT NULL
GROUP BY 1
""",
        "degree_stats": AN.degree_stats_sql(_WEIGHTED_SQL),
        "ccdf": AN.ccdf_sql(_WEIGHTED_SQL),
        "topk_parts_per_year": AN.topk_per_group_sql(
            """SELECT year(o.o_orderdate) AS year, p.p_type AS topic
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
               JOIN orders o ON l.l_orderkey = o.o_orderkey""",
            "year",
            "topic",
            k=5,
        ),
        "first_seen": AN.first_seen_sql(COLLAB_MODEL_SQL, "author", "year"),
        "lost_authors": AN.lost_nodes_sql(_MEMBERSHIP_SQL),
        "community_overlap": AN.community_overlap_sql(_MEMBERSHIP_SQL),
        "sessionize": AN.sessionize_sql("events"),
        "dedup_exact": DD.exact_dup_groups_sql("documents"),
        "text_stats": f"""
SELECT doc_id,
  {TX.token_count_sql('text')} AS n_tok,
  {TX.punct_count_sql('text')} AS n_punct,
  {TX.stopword_count_sql('text')} AS n_stop,
  {TX.quality_score_sql('text')} AS quality,
  {TX.lang_id_sql('text')} AS lang_pred,
  {TX.fingerprint_sql('text')} AS fp
FROM documents
""",
        "minhash_candidates": DD.minhash_candidate_pairs_sql("documents"),
        "ngram_jaccard": f"""
SELECT a, b, round(jaccard, 6) AS jaccard
FROM ({DD.ngram_jaccard_pairs_sql('documents', threshold=0.6)})
""",
        "simhash": DD.simhash_sql("documents"),
        "simhash_neardup": DD.simhash_neardup_pairs_sql("documents", max_hamming=3),
        "ann_topk": SIM.brute_force_topk_sql("embeddings", _QUERIES_VEC_SQL, k=5),
        "ann_lsh_topk": SIM.lsh_topk_sql("embeddings", _QUERIES_VEC_SQL, k=5),
        "lsh_histogram": SIM.lsh_bucket_histogram_sql("embeddings"),
        "embedding_neardup": SIM.embedding_neardup_pairs_sql("embeddings", threshold=0.9),
        "url_canonicalize": f"""
SELECT doc_id,
  {URL.canonicalize_url_sql('url')} AS canonical_url,
  {URL.url_hash_sql('url')} AS url_hash,
  {URL.url_host_sql('url')} AS host
FROM ({_SYNTH_URL_SQL})
""",
        "tpch_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
""",
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: weighted collaboration graph (reference openalex_graph
    main+weighted modes fused) on sf0.001."""
    return ED.weighted_edges(ED.pairwise_edges(collab_model(spark, SF001)))
