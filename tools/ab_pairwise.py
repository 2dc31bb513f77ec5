"""Same-session A/B bench for pairwise_edges variants (VERDICT r3 #1).

Runs each variant N warm reps at $SPARK_GRAFT_SF_DIR on local[32] and
prints per-variant median wall. Quiet-box rules apply (see memory):
compare warm pairs only, in ONE session, interleaved rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from openalex_collaboration_crawler_spark.session import get_spark
from openalex_collaboration_crawler_spark.sources.tables import collab_model

REPS = int(os.environ.get("AB_REPS", "5"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PAIR_FILTER = (
    "flatten(transform(__as, x -> "
    "transform(filter(__as, y -> x < y), y -> struct(x AS a1, y AS a2))))"
)
# sorted-prefix generator: sort once, pair each y with the strict-prefix
# before its FIRST occurrence (all x < y); multiplicities preserved.
PAIR_SORTED = (
    "flatten(transform(__s, y -> "
    "transform(slice(__s, 1, array_position(__s, y) - 1), "
    "x -> struct(x AS a1, y AS a2))))"
)


def v_r2_selfjoin(au: DataFrame) -> DataFrame:
    a = au.select("work_id", F.col("author").alias("a1"), "year")
    b = au.select("work_id", F.col("author").alias("a2"))
    pairs = a.join(b, on="work_id").where(F.col("a1") < F.col("a2"))
    solo = (
        au.groupBy("work_id", "year")
        .agg(F.count("*").alias("n"), F.min("author").alias("a"))
        .where(F.col("n") == 1)
        .select("work_id", F.col("a").alias("a1"), F.col("a").alias("a2"), "year")
    )
    return pairs.select("year", "work_id", "a1", "a2").unionByName(
        solo.select("year", "work_id", "a1", "a2")
    )


def _hybrid(grouped: DataFrame, pair_expr_sql: str, sort_first: bool) -> DataFrame:
    g = grouped
    if sort_first:
        g = g.withColumn("__s", F.array_sort("__as"))
        solo_src = "__s"
    else:
        solo_src = "__as"
    pair_expr = F.when(
        F.size(solo_src) == 1,
        F.array(
            F.struct(
                F.element_at(solo_src, 1).alias("a1"),
                F.element_at(solo_src, 1).alias("a2"),
            )
        ),
    ).otherwise(F.expr(pair_expr_sql))
    return g.select("year", "work_id", F.explode(pair_expr).alias("__p")).select(
        "year", "work_id", F.col("__p.a1").alias("a1"), F.col("__p.a2").alias("a2")
    )


def v_hybrid_gy(au: DataFrame) -> DataFrame:  # r3 current: group (work_id, year)
    grouped = au.groupBy("work_id", "year").agg(F.collect_list("author").alias("__as"))
    return _hybrid(grouped, PAIR_FILTER, sort_first=False)


def v_hybrid_w(au: DataFrame) -> DataFrame:  # group work_id only
    grouped = au.groupBy("work_id").agg(
        F.collect_list("author").alias("__as"), F.min("year").alias("year")
    )
    return _hybrid(grouped, PAIR_FILTER, sort_first=False)


def v_hybrid_w_sorted(au: DataFrame) -> DataFrame:
    grouped = au.groupBy("work_id").agg(
        F.collect_list("author").alias("__as"), F.min("year").alias("year")
    )
    return _hybrid(grouped, PAIR_SORTED, sort_first=True)


VARIANTS = {
    "r2_selfjoin": v_r2_selfjoin,
    "hybrid_gy": v_hybrid_gy,
    "hybrid_w": v_hybrid_w,
    "hybrid_w_sorted": v_hybrid_w_sorted,
}


def main() -> None:
    spark = get_spark(app_name="ab_pairwise")
    au = collab_model(spark, SF_DIR)

    # sanity: identical result hash across variants
    def h(df: DataFrame) -> tuple:
        r = (
            df.select(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(year, work_id, a1, a2))").alias("s"),
            )
            .collect()[0]
        )
        return (r["n"], r["s"])

    base = None
    for name, fn in VARIANTS.items():
        hv = h(fn(au))
        if base is None:
            base = hv
        status = "OK" if hv == base else f"MISMATCH {hv} vs {base}"
        print(f"sanity {name}: n={hv[0]} {status}", file=sys.stderr)

    # warmup one rep each, then interleaved timed rounds
    results: dict[str, list[float]] = {k: [] for k in VARIANTS}
    for name, fn in VARIANTS.items():
        fn(au).write.format("noop").mode("overwrite").save()
    for rep in range(REPS):
        for name, fn in VARIANTS.items():
            t0 = time.time()
            fn(au).write.format("noop").mode("overwrite").save()
            results[name].append(round(time.time() - t0, 3))

    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "median": med, "all": results}))
    spark.stop()


if __name__ == "__main__":
    main()
