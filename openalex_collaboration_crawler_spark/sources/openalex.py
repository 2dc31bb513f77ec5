"""OpenAlex snapshot schemas + readers (FIXTURES.md F2/F3).

The reference reads gzip JSONL shards line-at-a-time with simdjson
(generation/src/decompress.cpp, openalex_json.cpp). Here a snapshot
is read as a *text* DataFrame so the raw line survives as a column —
the reference's raw-substring pre-filters (P3/P4, SURVEY §4.3.1) are
observable behavior and must run against the raw bytes, not the
parsed struct. Parsing is ``from_json`` (PERMISSIVE: malformed →
null struct → dropped, mirroring the reference's try/catch-skip).

Spark reads ``.gz`` text natively (one task per gzip file — the same
file-granular parallelism as the reference's work queue); at
cluster scale snapshots live as Iceberg/parquet with the raw line
retained as a column, which is splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUTHOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("display_name", T.StringType()),
        T.StructField(
            "affiliations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "institution",
                            T.StructType([T.StructField("country_code", T.StringType())]),
                        ),
                        # numbers coerce to strings; non-numeric entries
                        # survive for the "-1" sentinel rule
                        T.StructField("years", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
    ]
)

# compact author record (reference decompress.cpp:62-71):
# {"id": ..., "display_name": ..., "affs": [{"<year>": "<country>"}, ...]}
COMPACT_AUTHOR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("display_name", T.StringType()),
        T.StructField("affs", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
    ]
)

WORK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("publication_year", T.LongType()),
        T.StructField(
            "concepts",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("display_name", T.StringType()),
                        T.StructField("score", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "topics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("display_name", T.StringType()),
                        T.StructField(
                            "subfield",
                            T.StructType([T.StructField("display_name", T.StringType())]),
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "authorships",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "author",
                            T.StructType(
                                [
                                    T.StructField("id", T.StringType()),
                                    T.StructField("display_name", T.StringType()),
                                ]
                            ),
                        ),
                        T.StructField("countries", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
    ]
)


def read_jsonl_raw(spark: SparkSession, path: str) -> DataFrame:
    """Raw lines (gzip-transparent), empty lines dropped — the
    reference skips them (decompress.cpp:119-121)."""
    return spark.read.text(path).withColumnRenamed("value", "raw").where(F.length("raw") > 0)


def raw_from_lines(spark: SparkSession, lines: list[str]) -> DataFrame:
    """Fixture helper: a raw-line DataFrame from in-memory strings."""
    return spark.createDataFrame([(l,) for l in lines], "raw string").where(
        F.length("raw") > 0
    )


def parse_authors(raw: DataFrame) -> DataFrame:
    """raw → (raw, id, display_name, affiliations) with the reference's
    sentinels: missing id/display_name → 'not found'
    (openalex_json.cpp:18-19); malformed JSON → affiliations null
    (parse failure keeps the sentinel row with no affs, matching the
    reference's catch-all that returns whatever was collected)."""
    j = F.from_json("raw", AUTHOR_SCHEMA)
    return raw.select(
        "raw",
        F.coalesce(j["id"], F.lit("not found")).alias("id"),
        F.coalesce(j["display_name"], F.lit("not found")).alias("display_name"),
        j["affiliations"].alias("affiliations"),
    )


def parse_works(raw: DataFrame) -> DataFrame:
    j = F.from_json("raw", WORK_SCHEMA)
    return raw.select("raw", j.alias("w"))
