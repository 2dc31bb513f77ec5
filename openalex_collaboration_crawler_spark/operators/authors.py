"""Author pipeline (reference ``openalex_authors``, SURVEY §3.1).

Two stages, reproduced with the reference's observable quirks:

1. **extract** (reference authors.cpp worker loop + decompress.cpp:
   54-71, openalex_json.cpp:14-72): parse author JSONL → cartesian
   (country × years) affiliation pairs with sentinels
   ('No institution found' country, '-1' non-numeric year,
   'not found' id/name), duplicates allowed (SURVEY §4.3.5), records
   with zero pairs dropped (decompress.cpp:58-60). Output is the
   compact JSONL form ``{"id","display_name","affs":[{year:country}]}``.

2. **compress** (openalex_json.cpp:74-139): quoted-country raw
   substring pre-filter (the P3 parity trap — matches ANYWHERE in
   the line, e.g. inside a display_name), then group by
   **display_name** (not id — §4.3.3: name collisions merge) →
   year → distinct countries. Final output = distinct names
   (authors.cpp:146-153).

The reference needs a sequential second phase because its AffMap is
a single in-RAM hashmap; here both stages are one shuffle each and
scale horizontally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openalex_collaboration_crawler_spark.sources.openalex import parse_authors


def extract_author_affs(raw: DataFrame) -> DataFrame:
    """Exploded (id, display_name, country, year) pairs — country ×
    every entry of the years array (openalex_json.cpp:39-66), with
    sentinels; rows with no affiliations vanish via the explode."""
    parsed = parse_authors(raw)
    aff = parsed.select(
        "id",
        "display_name",
        F.explode("affiliations").alias("aff"),
    ).select(
        "id",
        "display_name",
        F.coalesce(F.col("aff.institution.country_code"), F.lit("No institution found")).alias(
            "country"
        ),
        F.explode("aff.years").alias("year_raw"),
    )
    # non-numeric year → "-1" (openalex_json.cpp:58-62)
    year = F.when(
        F.col("year_raw").rlike(r"^-?[0-9]+$"), F.col("year_raw")
    ).otherwise(F.lit("-1"))
    return aff.select("id", "display_name", "country", year.alias("year"))


def compact_author_records(raw: DataFrame) -> DataFrame:
    """The compact JSONL rows (decompress.cpp:62-71): one line per
    input author that has ≥1 (country, year) pair; affs entries keep
    duplicates and input order (country-major, year-minor)."""
    pairs = extract_author_affs(raw)
    grouped = pairs.groupBy("id", "display_name").agg(
        F.collect_list(F.create_map(F.col("year"), F.col("country"))).alias("affs")
    )
    return grouped.select(
        F.to_json(F.struct("id", "display_name", "affs")).alias("raw"),
        "id",
        "display_name",
        "affs",
    )


def compress_author_affmap(compact: DataFrame, country_filter: str = "") -> DataFrame:
    """AffMap as a table: (display_name, year, countries sorted-distinct).

    ``compact`` must carry the compact records' raw line in ``raw``
    plus ``display_name`` and ``affs``; the raw substring filter runs
    against the raw line exactly like the reference
    (openalex_json.cpp:98-100) — quoted country code, anywhere.

    Fidelity note: the reference serializes compact records WITHOUT
    escaping (decompress.cpp:62-71, ``out << display_name``), so any
    display_name containing ``"`` or ``\\`` yields invalid JSON that
    the compress parse then silently drops (openalex_json.cpp:
    101-104). Our compact form is valid JSON, so we reproduce the
    observable outcome by dropping those names explicitly."""
    df = compact.where(
        ~F.col("display_name").contains('"') & ~F.col("display_name").contains("\\")
    )
    if country_filter:
        df = df.where(F.col("raw").contains(f'"{country_filter}"'))
    entries = df.select(
        "display_name", F.explode("affs").alias("aff")
    ).select("display_name", F.explode("aff").alias("year", "country"))
    return entries.groupBy("display_name", "year").agg(
        F.array_sort(F.collect_set("country")).alias("countries")
    )


def author_names(affmap: DataFrame) -> DataFrame:
    """Final step-1 output: distinct display names (authors.cpp:146-153)."""
    return affmap.select("display_name").distinct()
