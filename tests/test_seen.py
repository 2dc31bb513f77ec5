"""Seen-set properties: bloom no-false-negatives + FP bound; cuckoo
insert/probe/delete; Spark-side build/probe/dedup round trip."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from openalex_collaboration_crawler_spark.streaming.seen import (
    CuckooFilter,
    bloom_build_blob,
    bloom_probe_blob,
    build_bloom_table,
    build_cuckoo_table,
    dedup_against_seen,
)

RNG = np.random.default_rng(42)


def test_bloom_no_false_negatives_and_fpp():
    members = RNG.integers(0, 2**60, size=20_000, dtype=np.int64).view(np.uint64)
    others = RNG.integers(0, 2**60, size=20_000, dtype=np.int64).view(np.uint64)
    others = np.setdiff1d(others, members)
    blob = bloom_build_blob(members, fpp=0.01)
    assert bloom_probe_blob(blob, members).all()  # no false negatives, ever
    fp_rate = bloom_probe_blob(blob, others).mean()
    assert fp_rate < 0.03  # documented bound: ~1% target, 3x slack


def test_bloom_empty():
    blob = bloom_build_blob(np.array([], dtype=np.uint64))
    assert not bloom_probe_blob(blob, np.array([123], dtype=np.uint64)).any()


def test_cuckoo_insert_contains_delete():
    cf = CuckooFilter(10_000)
    items = RNG.integers(0, 2**60, size=8_000, dtype=np.int64)
    fails = cf.insert_many(items)
    assert fails == 0
    assert cf.contains_many(items).all()  # no false negatives
    others = RNG.integers(0, 2**60, size=8_000, dtype=np.int64)
    others = np.setdiff1d(others, items)
    assert cf.contains_many(others).mean() < 0.02  # 16-bit fp → tiny FPR
    # delete half, they must disappear; the rest must remain
    half = items[:4_000]
    cf.delete_many(half)
    # deletions can't create false negatives for remaining members
    assert cf.contains_many(items[4_000:]).all()
    # deleted items mostly gone (residual hits = fingerprint collisions)
    assert cf.contains_many(half).mean() < 0.05


def test_cuckoo_serialization_roundtrip():
    cf = CuckooFilter(1000)
    items = RNG.integers(0, 2**60, size=500, dtype=np.int64)
    cf.insert_many(items)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.contains_many(items).all()


def test_spark_bloom_dedup_exact(spark):
    seen = spark.range(0, 1000).select((F.col("id") * 7919).alias("url_hash"))
    cand = spark.range(0, 2000).select(
        (F.col("id") * 7919).alias("url_hash"), F.col("id").alias("payload")
    )
    bloom = build_bloom_table(seen, n_parts=4)
    got = dedup_against_seen(cand, seen, bloom, n_parts=4)
    ids = sorted(r["payload"] for r in got.collect())
    assert ids == list(range(1000, 2000))  # exactly the unseen half


def test_spark_cuckoo_table_builds(spark):
    seen = spark.range(0, 500).select((F.col("id") * 104729).alias("url_hash"))
    tbl = build_cuckoo_table(seen, n_parts=4).collect()
    assert len(tbl) == 4
    total_hits = 0
    for row in tbl:
        cf = CuckooFilter.from_bytes(bytes(row["blob"]))
        hits = cf.contains_many(np.arange(500, dtype=np.int64) * 104729)
        total_hits += int(hits.sum())
    assert total_hits >= 500  # every member found in its partition's filter
