"""Dataflow operators (SURVEY.md §2) + training-data pipeline ops."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ONLY if the input is under-partitioned relative to
    the cluster (e.g. a single small parquet file → 1-task scan stage
    that serializes all downstream per-row compute).

    At warehouse scale inputs arrive in many splits and this is a
    no-op — we never force a full shuffle of large data; the guard
    compares the current partition count to the cluster parallelism."""
    sc = df.sparkSession.sparkContext
    target = max(2, sc.defaultParallelism * factor)
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
