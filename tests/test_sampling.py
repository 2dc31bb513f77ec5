"""Deterministic sampling / split operators (training-data curation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openalex_collaboration_crawler_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("it")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )


def test_stratified_sample_rates_and_determinism(spark):
    docs = _docs(spark)
    rates = {"en": 0.5, "de": 1.0, "fr": 0.0}
    s = stratified_sample(docs, "doc_id", "lang", rates, default_rate=0.2)
    got = s.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert by_lang["de"] == 500          # rate 1.0 keeps everything
    assert "fr" not in by_lang           # rate 0.0 drops everything
    assert 180 <= by_lang["en"] <= 320   # ~50% of 500
    assert 50 <= by_lang["it"] <= 160    # default 20% of 500

    # membership is partitioning-independent: identical under reshuffle
    ids1 = {r["doc_id"] for r in s.collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(17, "lang"), "doc_id", "lang", rates, default_rate=0.2
        ).collect()
    }
    assert ids1 == ids2


def test_stratified_sample_no_shuffle(spark):
    docs = _docs(spark)
    s = stratified_sample(docs, "doc_id", "lang", {"en": 0.5})
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter: pushes to the scan


def test_hash_split_disjoint_and_stable(spark):
    docs = _docs(spark)
    sp = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = sp.collect()
    assert all(r["split"] in ("train", "val", "test") for r in rows)  # full coverage
    assert len(rows) == 2000
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    # disjoint and exhaustive
    assert sum(len(v) for v in by.values()) == 2000
    assert 1450 <= len(by["train"]) <= 1750
    # same key → same split under any partitioning
    sp2 = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            docs.repartition(13), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert all(sp2[r["doc_id"]] == r["split"] for r in rows)


def test_hash_split_rejects_over_one(spark):
    import pytest

    with pytest.raises(ValueError):
        hash_split(_docs(spark), "doc_id", {"a": 0.7, "b": 0.5})


def test_stratified_sample_exact_oracle_on_unrepresentable_rates(spark):
    """Rates like 0.3/0.7 are not binary-representable: a double
    multiply cast to long truncates in Spark (0.3*1e6 -> 299999) while
    DuckDB's DECIMAL arithmetic rounds (-> 300000). Both sides now
    embed the SAME int(round(r*1e6)) literal (round-3 ADVICE), so the
    engines must agree row-for-row at every rate."""
    import duckdb

    from openalex_collaboration_crawler_spark.operators.sampling import (
        stratified_sample_sql,
    )

    docs = _docs(spark)
    rates = {"en": 0.3, "de": 0.7, "fr": 0.1}
    spark_ids = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs, "doc_id", "lang", rates, default_rate=0.9
        ).collect()
    )
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    sql = stratified_sample_sql("SELECT * FROM docs", "doc_id", "lang", rates, 0.9)
    duck_ids = sorted(r[0] for r in con.execute(
        f"SELECT doc_id FROM ({sql}) ORDER BY doc_id").fetchall())
    assert spark_ids == duck_ids
    assert len(spark_ids) > 0
