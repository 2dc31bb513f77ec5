"""Bucketed (co-located) table helpers — the shuffle-free join pattern.

At 100-TB scale the biggest recurring shuffles are equi-joins on a
stable key (works→authorships on work_id, seen-set probes on
url_hash). Writing both sides bucketed on that key with the same
bucket count lets Spark plan a sort-merge join with ZERO exchanges —
each task reads bucket i of both tables. This module wraps the write
(bucketBy + saveAsTable — bucketing metadata lives in the catalog,
plain parquet paths can't carry it) and a plan assertion helper used
by tests/benchmarks to PROVE the exchange disappeared.

The frontier's seen-set deltas and the pending table are the intended
production users (BASELINE.json names Iceberg; Iceberg's bucket
partition transform is the same contract — this is the builtin-
catalog equivalent available in the sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Save ``df`` as a bucketed (and optionally sorted) table; an
    existing table of the same name is replaced."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.mode("overwrite").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned
    without a shuffle when both sides share the bucket spec."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def n_shuffle_exchanges(df: DataFrame) -> int:
    """Count shuffle exchanges in the executed plan (ReusedExchange and
    broadcast exchanges excluded) — 0 for a co-located bucketed join."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
