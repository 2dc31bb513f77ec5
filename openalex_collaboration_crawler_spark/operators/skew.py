"""Explicit skew handling: salted repartition / salted join.

The north rule calls for "salted repartitioning to defuse hot-host /
hot-institution skew at 10^10-frontier scale". AQE's skew-join
(enabled in session.py) handles most cases at runtime; these helpers
cover the two places AQE can't:

- ``salted_repartition``: spread ONE hot key's rows across many
  partitions before a mapPartitions-style op (e.g. per-host fetch
  batches where one host owns 30% of the frontier).
- ``skew_join``: sort-merge join where the BIG side has hot keys —
  salt the big side, replicate the small side once per salt. The
  small side grows ×n_salts (fine when it is dimension-sized); every
  hot key's rows now land in n_salts different reducers.

Both are result-identical to their unsalted forms (tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key: str, n_salts: int = 16, n_partitions: int | None = None) -> DataFrame:
    """Repartition on (key, salt) — a hot key spreads over n_salts
    partitions. Salt is derived from xxhash64 of the whole row's
    stable id if present, else a deterministic hash of the key plus a
    per-row rand-free discriminator (monotonically_increasing_id is
    avoided: it's partition-layout-dependent). Callers aggregate by
    key afterwards (partial aggs make the unsalt free)."""
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
    out = df.withColumn("__salt", salt)
    if n_partitions:
        return out.repartition(n_partitions, F.col(key), F.col("__salt")).drop("__salt")
    return out.repartition(F.col(key), F.col("__salt")).drop("__salt")


def skew_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ×n_salts. Result-identical to ``big.join(small, on, how)`` for the
    supported join types; right/full outer are REJECTED (replicating
    the small side would duplicate its unmatched rows n_salts times).

    Use when a sort-merge join stalls on a few hot keys and the small
    side is too big to broadcast outright but fine to replicate
    n_salts times across the shuffle."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"skew_join supports {sorted(allowed)}; got {how!r} — right/full outer "
            "would emit unmatched small-side rows once per salt"
        )
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")


def hot_keys(df: DataFrame, key: str, top_n: int = 20) -> DataFrame:
    """Skew diagnostic: the heaviest keys and their share of rows."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .withColumn("share", F.round(F.col("n") / F.lit(float(total)), 4))
        .orderBy(F.desc("n"))
        .limit(top_n)
    )
