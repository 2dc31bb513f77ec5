"""Deterministic sampling operators for training-data curation.

A 100-TB corpus pipeline constantly needs reproducible subsets:
per-stratum rate sampling (downweight a dominant language / quality
bucket), and leakage-free train/val/test splits that survive reruns
and joins. Spark's ``sample``/``sampleBy`` are seeded but depend on
partitioning (row order), so a repartitioned rerun samples different
rows. These operators decide membership from a PORTABLE hash of the
row's stable key — the decision is a pure function of (key, salt),
independent of partitioning, cluster size, and engine (so every
operator here has an exact DuckDB oracle twin).

Scale shape: pure column math (one hash per row, no shuffle at all —
the filter pushes into the scan's project/filter), which is the only
acceptable cost for a full-corpus pass at 100 TB.

Reference provenance: the reference has no sampling layer (its
datasets fit pandas); these are the curation ops its pipeline would
need at corpus scale (SURVEY §7 'beyond the reference').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openalex_collaboration_crawler_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

#: hash-bucket resolution for rates: 1e6 buckets → rate granularity 1e-6
_BUCKETS = 1_000_000


def _bucket(key: Column, salt: str) -> Column:
    return F.pmod(portable_hash64(key.cast("string"), salt=salt), F.lit(_BUCKETS))


def _bucket_sql(key_expr: str, salt: str) -> str:
    return f"({portable_hash64_sql(f'CAST({key_expr} AS VARCHAR)', salt=salt)}) % {_BUCKETS}"


def _threshold(rate: float) -> int:
    """Rate → integer bucket threshold, computed once driver-side so
    Spark and the SQL oracle compare against the SAME literal."""
    return int(round(float(rate) * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Keep each row with its stratum's rate, decided by hash(key):
    deterministic across reruns/partitionings, no shuffle. Strata not
    in ``rates`` use ``default_rate`` (0 = drop).

    Thresholds are computed ONCE in Python as ``int(round(r * 1e6))``
    and embedded as integer literals in both the Spark when-chain and
    the SQL CASE (round-3 ADVICE): a double multiply cast to long
    truncates (0.3 → 299999 in Spark) while DuckDB's DECIMAL rounds
    (→ 300000) — binary-unrepresentable rates would silently break
    the exact-oracle guarantee."""
    thresh = None
    for s, r in sorted(rates.items()):
        cond = F.col(strata_col) == F.lit(s)
        t = F.lit(_threshold(r))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    default_t = F.lit(_threshold(default_rate))
    thresh = default_t if thresh is None else thresh.otherwise(default_t)
    return df.where(_bucket(F.col(key_col), salt) < thresh)


def stratified_sample_sql(
    table_sql: str,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat",
) -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {_threshold(r)}" for s, r in sorted(rates.items())
    )
    thresh = f"(CASE {strata_col} {whens} ELSE {_threshold(default_rate)} END)"
    return f"""
SELECT * FROM ({table_sql})
WHERE {_bucket_sql(key_col, salt)} < {thresh}
"""


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Leakage-free dataset split: every row gets a ``split`` label
    ('train'/'val'/'test'/...) from disjoint hash-bucket ranges in the
    order of sorted split names — the same key always lands in the
    same split, on any cluster, in any engine, forever. Fractions must
    sum to ≤ 1; the remainder (if any) is labeled NULL (excluded
    rows). One hash per row, zero shuffle."""
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = _bucket(F.col(key_col), salt)
    label = None
    lo = 0.0
    for name, frac in sorted(splits.items()):
        hi = lo + frac
        cond = (b >= F.lit(int(round(lo * _BUCKETS)))) & (b < F.lit(int(round(hi * _BUCKETS))))
        label = F.when(cond, F.lit(name)) if label is None else label.when(cond, F.lit(name))
        lo = hi
    return df.withColumn("split", label)


def hash_split_sql(
    table_sql: str,
    key_col: str,
    splits: dict[str, float],
    salt: str = "split",
) -> str:
    b = _bucket_sql(key_col, salt)
    cases = []
    lo = 0.0
    for name, frac in sorted(splits.items()):
        hi = lo + frac
        cases.append(
            f"WHEN ({b}) >= {int(round(lo * _BUCKETS))} AND ({b}) < {int(round(hi * _BUCKETS))} THEN '{name}'"
        )
        lo = hi
    case = "CASE " + " ".join(cases) + " ELSE NULL END"
    return f"SELECT *, {case} AS split FROM ({table_sql})"
