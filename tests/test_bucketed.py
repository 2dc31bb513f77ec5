"""Bucketed co-located join: the shuffle disappears (plan-verified)."""

from __future__ import annotations

from openalex_collaboration_crawler_spark.sources.bucketed import (
    bucketed_join,
    n_shuffle_exchanges,
    write_bucketed,
)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "k")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    ).withColumnRenamed("o_orderkey", "k")
    write_bucketed(li, "t_li_bucketed", "k", n_buckets=8)
    write_bucketed(o, "t_o_bucketed", "k", n_buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = li.join(o, "k")
        assert n_shuffle_exchanges(plain) >= 2  # both sides shuffle
        b = bucketed_join(spark, "t_li_bucketed", "t_o_bucketed", "k")
        assert n_shuffle_exchanges(b) == 0  # co-located: zero exchanges
        # and the result is identical
        assert b.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")
