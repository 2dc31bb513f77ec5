"""Per-host politeness scheduler + robots.txt filter.

The reference's politeness is implicit — one .gz file per worker at a
time (generation/src/authors.cpp:93-123). For a real crawl the
engine makes it explicit:

- **Token budget**: each host gets ``max_per_batch`` fetch slots per
  micro-batch (a micro-batch is the time quantum, so slots/batch ==
  a rate limit). Selection inside a host is deterministic:
  ``row_number`` over (depth asc, priority desc, url_hash asc) —
  crawl ordering is a pure function of the data, never of task
  scheduling (north rule "matching crawl ordering").
- **Robots**: a (host, disallow-prefix-array) table, broadcast to the
  candidate join (robots caches are tiny relative to the frontier);
  a URL is blocked when any prefix matches its path.

Scale notes: the window partitions by host — exactly the skew axis.
A hot host holding 30% of the frontier lands in one partition, but
the window only needs a per-host top-``max_per_batch``; AQE's skew
split plus the tight per-host cap keeps the sorted set tiny. The
global batch cap is applied with one more deterministic sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def frontier_order() -> list:
    """The deterministic crawl order: depth asc, priority desc,
    url_hash asc, url asc (built lazily — Column exprs need a live
    session). The url tiebreak matches the oracle's sort tuple and
    makes the order total even under a url_hash collision."""
    return [F.asc("depth"), F.desc("priority"), F.asc("url_hash"), F.asc("url")]


def with_robots_blocked(
    candidates: DataFrame, robots: DataFrame, flag: str = "robots_blocked"
) -> DataFrame:
    """Adds a boolean ``flag`` column: URL path starts with a disallowed
    prefix for its host. ``candidates`` must carry (url, host). The
    robots cache is broadcast (tiny relative to the frontier)."""
    path = F.regexp_extract(F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    with_path = candidates.withColumn("__path", F.when(path == "", "/").otherwise(path))
    joined = with_path.join(F.broadcast(robots), "host", "left")
    blocked = F.when(
        F.col("disallow").isNotNull(),
        F.exists("disallow", lambda d: F.col("__path").startswith(d)),
    ).otherwise(F.lit(False))
    return joined.withColumn(flag, blocked).drop("__path", "disallow")


def robots_filter(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop candidates whose URL path starts with a disallowed prefix
    for its host. ``candidates`` must carry (url, host)."""
    return (
        with_robots_blocked(candidates, robots, "__blocked")
        .where(~F.col("__blocked"))
        .drop("__blocked")
    )


# Below this candidate count a single-partition window ranks the batch
# in ONE extra shuffle (fewer stages = lower per-batch floor); above
# it, the serial sort becomes an Amdahl fraction at high parallelism
# and the two-phase parallel range rank wins despite its extra stages.
SMALL_BATCH_ROWS = 100_000


def select_batch(
    pending: DataFrame,
    politeness: DataFrame,
    robots: DataFrame | None = None,
    batch_cap: int = 1 << 30,
    default_per_host: int = 8,
    est_rows: int | None = None,
    skip_caps: bool = False,
    salt_caps: bool | None = None,
    n_salts: int = 64,
) -> DataFrame:
    """Pick this micro-batch's fetch set, deterministically.

    pending: (url, url_hash, host, depth, priority, ...).
    politeness: (host, max_per_batch). Hosts absent from the table get
    ``default_per_host``. Output adds ``seq`` — the batch-local crawl
    order (0-based), the parity contract with the sequential oracle.

    ``est_rows`` (an upper bound on the candidate count, e.g. the
    crawl loop's committed pending counter) picks the ranking
    strategy: below SMALL_BATCH_ROWS a single-partition window ranks
    the politeness-capped set in ONE extra shuffle; above it the
    static-bucket parallel rank (:func:`add_global_seq`) keeps every
    task bounded. Both produce the identical ``seq`` — the order is a
    pure function of the data (north rule).

    ``skip_caps=True`` asserts that no per-host budget can bind (the
    caller proved every cap ≥ the candidate count) and skips the
    per-host capping window entirely. The window partitions by host —
    exactly the skew axis — so on a frontier where one hot host owns
    30% of the rows it is a single-task sort that scales with DATA
    but not with CORES; eliding it when the budget provably cannot
    bind removes that serial fraction.

    ``salt_caps`` (None = auto: engage when the candidate bound
    exceeds SMALL_BATCH_ROWS, the same switch as the ranking
    strategy) runs the capping as a TWO-PHASE salted top-N: phase 1
    ranks within (host, url_hash % n_salts) — a hot host's rows
    spread over ``n_salts`` tasks — keeping each slice's top-``cap``;
    phase 2 is the exact per-host window over the survivors, whose
    per-host partition is now ≤ n_salts × cap rows REGARDLESS of how
    skewed the frontier is. Result-identical to the single window
    (any row of a host's true top-cap is in the top-cap of its own
    salt slice; tests/test_skew.py asserts seq-level equality on a
    zipf frontier) — the north rule's "salted repartitioning to
    defuse hot-host skew" applied to the crawl path itself."""
    cand = pending if robots is None else robots_filter(pending, robots)
    if skip_caps:
        per_host = cand
    else:
        if salt_caps is None:
            salt_caps = est_rows is not None and est_rows > SMALL_BATCH_ROWS
        cand = cand.join(F.broadcast(politeness), "host", "left").withColumn(
            "__cap", F.coalesce(F.col("max_per_batch"), F.lit(default_per_host))
        )
        if salt_caps:
            # phase 1: per-(host, salt) top-cap — bounded tasks even
            # when one host owns most of the frontier. url_hash is
            # non-negative, so pmod is a pure monotone-free function
            # of row values (order-determinism unaffected: phase 2
            # re-ranks the survivors in the exact frontier order).
            w_salt = Window.partitionBy("host", "__salt").orderBy(*frontier_order())
            cand = (
                cand.withColumn("__salt", F.pmod(F.col("url_hash"), F.lit(n_salts)))
                .withColumn("__rn", F.row_number().over(w_salt))
                .where(F.col("__rn") <= F.col("__cap"))
                .drop("__rn", "__salt")
            )
        w_host = Window.partitionBy("host").orderBy(*frontier_order())
        per_host = (
            cand.withColumn("__rn", F.row_number().over(w_host))
            .where(F.col("__rn") <= F.col("__cap"))
            .drop("__rn", "__cap", "max_per_batch")
        )
    if est_rows is not None and est_rows <= SMALL_BATCH_ROWS:
        w = Window.orderBy(*frontier_order())
        ranked = per_host.withColumn("seq", F.row_number().over(w) - 1)
    else:
        ranked = add_global_seq(per_host)
    return ranked.where(F.col("seq") < batch_cap)


def add_global_seq(df: DataFrame, n_buckets: int = 256) -> DataFrame:
    """Deterministic dense global ``seq`` by (depth, -priority,
    url_hash, url) WITHOUT a single-partition sort and WITHOUT any
    driver round-trip.

    Static-bucket two-phase rank, fully in-plan: ``url_hash`` is
    :func:`~..functions.hashing.portable_hash64` — a uniform
    NON-NEGATIVE 60-bit MD5-derived value — so
    ``__b = url_hash >> (60 - log2(n_buckets))`` takes its top bits:
    a MONOTONE pure function of ``url_hash`` yielding ``n_buckets``
    balanced buckets. The global frontier order therefore factorizes
    as (depth asc, priority desc, __b asc, url_hash asc, url asc).
    Rank within each (depth, priority, __b) group in parallel, then
    shift by the cumulative counts of the groups before it — a window
    over the tiny (≤ n_buckets × |depth×priority| row) count table,
    broadcast-joined back.

    Versus the previous ``repartitionByRange`` + ``localCheckpoint``
    design this removes two Spark jobs per batch (the range
    exchange's boundary-SAMPLING pass — a full extra scan of the
    candidates — and the checkpoint materialization) and removes the
    determinism hazard outright: range boundaries depended on the
    child's row order (two evaluations could disagree after an
    upstream shuffle; observed at 150k rows, previously pinned with a
    localCheckpoint), while the static bucket is a pure function of
    row VALUES — identical on every evaluation at any parallelism,
    which is the north-rule ordering requirement."""
    if n_buckets & (n_buckets - 1) or not 0 < n_buckets <= 1 << 60:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = 60 - n_buckets.bit_length() + 1  # top log2(n_buckets) of 60 bits
    keyed = df.withColumn(
        "__b", F.shiftright(F.col("url_hash"), shift).cast("int")
    )
    counts = keyed.groupBy("depth", "priority", "__b").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # tiny unpartitioned window: ≤ n_buckets × |distinct (depth,
    # priority)| rows of counts — whitelisted in the plan-hygiene gate
    w_off = Window.orderBy(
        F.asc("depth"), F.desc("priority"), F.asc("__b")
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "depth",
        "priority",
        "__b",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    w = Window.partitionBy("depth", "priority", "__b").orderBy(
        F.asc("url_hash"), F.asc("url")
    )
    return (
        keyed.join(F.broadcast(offsets), ["depth", "priority", "__b"])
        .withColumn("seq", F.row_number().over(w) - 1 + F.col("__off"))
        .drop("__b", "__off")
    )
