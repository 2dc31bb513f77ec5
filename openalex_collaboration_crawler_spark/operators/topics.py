"""Topic-label normalization + synonym/category mapping joins (P11).

The reference's most-used analytics entry normalizes raw OpenAlex
topic labels before counting them
(/root/reference/analysis/01_metadata_analysis.py:259-293, 310-357):

1. parenthetical extract: ``"Set (abstract data type)"`` →
   ``"abstract data type".capitalize()`` → ``"Abstract data type"``
   (substring between the FIRST ``(`` and the FIRST ``)``; labels
   without both parens pass through);
2. ASCII fold (``text.encode("ascii","ignore")`` — drop non-ASCII,
   01_metadata_analysis.py:76-79);
3. delete-list: drop generic CS noise labels
   (``mappings.application_domains_to_delete``);
4. synonym filter/map: CS topics (``mappings.topics_mapping`` keys)
   are removed to focus on application domains
   (01_metadata_analysis.py:343 ``filter``);
5. category map: remaining labels collapse to coarse domains
   (``mappings.application_domains_mapping`` /
   ``topic_to_category.py``, 01_metadata_analysis.py:319-327
   ``uniform_application_domain``);
6. per-year percentage (round 2) + top-K slice
   (01_metadata_analysis.py:340-357).

Spark design: the mapping tables are DATA, not code — all three are
broadcast-map joins (each map is tiny relative to 10^10 topic rows:
the reference's largest, topic_to_category, is 57k rows ≈ 2 MB).
Everything else is column math + one (year, category) hash-agg with
map-side partial aggregation; the per-year totals reuse a window over
the (small) aggregated counts, not a second scan.

The module ships a representative default mapping set (a small,
cited subset of analysis/mappings.py) for tests/queries; production
users load the full tables as DataFrames.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Representative subset of the reference mapping tables
# (analysis/mappings.py:1-23, 25-165, 167-...; full tables are data
# inputs, not code — see module docstring).
DEFAULT_SYNONYM_FILTER = [
    "Programming language",
    "Artificial intelligence",
    "Operating system",
    "Algorithm",
    "Machine learning",
    "Computer vision",
    "Computer security",
    "Data science",
    "Data mining",
    "Information retrieval",
]
DEFAULT_DELETE_LIST = [
    "Computer science",
    "Deep learning",
    "Artificial neural network",
    "Cloud computing",
    "Software",
    "Database",
    "Computation",
    "Parsing",
    "Scalability",
    "Fuzzy logic",
]
DEFAULT_CATEGORY_MAP = {
    "Topology": "Mathematics",
    "Predicate logic": "Mathematics",
    "Commutative property": "Mathematics",
    "Semiconductor": "Engineering",
    "Signal processing": "Engineering",
    "Wireless": "Engineering",
    "Chemical analysis": "Chemistry",
    "Readability": "Linguistics",
    "Abstract data type": "Programming language",
}


#: Packaged full reference mapping tables (parquet DATA extracted from
#: analysis/mappings.py + analysis/topic_to_category.py by
#: tools/build_mapping_fixtures.py — ast-extracted literals, no
#: reference code executed).
DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")

FULL_MAPPING_TABLES = (
    "delete_list",          # application_domains_to_delete (label)
    "synonym_filter",       # topics_mapping keys (label)
    "synonym_map",          # topics_mapping (label, category)
    "application_domain_map",  # application_domains_mapping (label, category)
    "topic_to_category",    # 57k-row auto-generated table (label, category)
)


def mapping_table_path(name: str) -> str:
    return os.path.join(DATA_DIR, f"{name}.parquet")


def load_full_mappings(spark: SparkSession) -> dict[str, DataFrame]:
    """The reference's complete mapping tables as DataFrames — the
    packaged-data counterpart of the representative DEFAULT_* subsets.
    Keys: FULL_MAPPING_TABLES. All are broadcast-sized (≤57k rows,
    ≤1 MB parquet)."""
    return {name: spark.read.parquet(mapping_table_path(name)) for name in FULL_MAPPING_TABLES}


def normalize_topic_label(col: Column | str) -> Column:
    """Steps 1+2: parenthetical extract + ``str.capitalize()`` + ASCII
    fold — pure column ops (whole-stage codegen; the same expression
    runs scan-side at 100-TB scale)."""
    c = F.col(col) if isinstance(col, str) else col
    po = F.instr(c, "(")
    pc = F.instr(c, ")")
    inner = F.substring(c, po + 1, F.greatest(pc - po - 1, F.lit(0)))
    # python str.capitalize(): first char upper, REST lower
    cap = F.concat(F.upper(F.substring(inner, 1, 1)), F.lower(F.substring(inner, 2, 1 << 20)))
    picked = F.when((po > 0) & (pc > 0), cap).otherwise(c)
    return F.regexp_replace(picked, "[^\\x00-\\x7F]", "")


def normalize_topic_label_sql(expr: str) -> str:
    """DuckDB mirror of :func:`normalize_topic_label`."""
    po = f"strpos({expr}, '(')"
    pc = f"strpos({expr}, ')')"
    inner = f"substring({expr}, {po} + 1, greatest({pc} - {po} - 1, 0))"
    cap = f"(upper(substring({inner}, 1, 1)) || lower(substring({inner}, 2)))"
    picked = f"(CASE WHEN {po} > 0 AND {pc} > 0 THEN {cap} ELSE {expr} END)"
    return f"regexp_replace({picked}, '[^\\x00-\\x7F]', '', 'g')"


def _lists_to_dfs(
    spark: SparkSession,
    delete_list: list[str] | None,
    synonym_filter: list[str] | None,
    category_map: dict[str, str] | None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    dl = spark.createDataFrame(
        [(x,) for x in (delete_list if delete_list is not None else DEFAULT_DELETE_LIST)],
        "label string",
    )
    sy = spark.createDataFrame(
        [(x,) for x in (synonym_filter if synonym_filter is not None else DEFAULT_SYNONYM_FILTER)],
        "label string",
    )
    cm = spark.createDataFrame(
        list((category_map if category_map is not None else DEFAULT_CATEGORY_MAP).items()),
        "label string, category string",
    )
    return dl, sy, cm


def topic_category_distribution(
    topics: DataFrame,
    year_col: str = "year",
    topic_col: str = "topic",
    delete_list: DataFrame | None = None,
    synonym_filter: DataFrame | None = None,
    category_map: DataFrame | None = None,
    k: int = 10,
) -> DataFrame:
    """Steps 1-6 of the reference pipeline over a (year, topic) table.

    ``delete_list``/``synonym_filter``: 1-column ``label`` tables;
    ``category_map``: (label, category). All three are broadcast
    (tiny vs the topic stream). Output: (year, category, pct, rank)
    for the top-``k`` categories per year — pct rounded to 2 like the
    reference (01_metadata_analysis.py:286-289), rank by pct desc
    then label asc (rank-first semantics)."""
    spark = topics.sparkSession
    if delete_list is None or synonym_filter is None or category_map is None:
        dl, sy, cm = _lists_to_dfs(spark, None, None, None)
        delete_list = delete_list if delete_list is not None else dl
        synonym_filter = synonym_filter if synonym_filter is not None else sy
        category_map = category_map if category_map is not None else cm

    norm = topics.select(
        F.col(year_col).alias("year"),
        normalize_topic_label(topic_col).alias("label"),
    )
    # one partial-agg shuffle collapses the raw topic stream FIRST;
    # the mapping joins then run on the (small) distinct counts
    counts = norm.groupBy("year", "label").agg(F.count("*").alias("n"))
    kept = counts.join(
        F.broadcast(delete_list.select("label")), "label", "left_anti"
    ).join(F.broadcast(synonym_filter.select("label")), "label", "left_anti")
    mapped = (
        kept.join(F.broadcast(category_map), "label", "left")
        .select(
            "year",
            F.coalesce(F.col("category"), F.col("label")).alias("category"),
            "n",
        )
        .groupBy("year", "category")
        .agg(F.sum("n").alias("n"))
    )
    w_tot = Window.partitionBy("year")
    pct = F.round(
        F.col("n").cast("double") / F.sum("n").over(w_tot).cast("double") * 100.0, 2
    )
    w_rank = Window.partitionBy("year").orderBy(F.desc("pct"), F.asc("category"))
    return (
        mapped.withColumn("pct", pct)
        .withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select("year", "category", "pct", "rank")
    )


def topic_category_distribution_sql(
    topics_sql: str,
    year_col: str = "year",
    topic_col: str = "topic",
    delete_list: list[str] | None = None,
    synonym_filter: list[str] | None = None,
    category_map: dict[str, str] | None = None,
    k: int = 10,
) -> str:
    dl = delete_list if delete_list is not None else DEFAULT_DELETE_LIST
    sy = synonym_filter if synonym_filter is not None else DEFAULT_SYNONYM_FILTER
    cm = category_map if category_map is not None else DEFAULT_CATEGORY_MAP

    def vals(xs: list[str]) -> str:
        return ", ".join(f"('{x.replace(chr(39), chr(39) * 2)}')" for x in xs)

    # NOT EXISTS, not NOT IN: NOT IN against a NULL-bearing (or
    # NULL-placeholder empty) list yields no rows at all — the opposite
    # of the Spark side, where an empty list filters nothing.
    filters = []
    ctes = []
    if dl:
        ctes.append(f"dl(label) AS (VALUES {vals(dl)}),")
        filters.append("NOT EXISTS (SELECT 1 FROM dl WHERE dl.label = c.label)")
    if sy:
        ctes.append(f"sy(label) AS (VALUES {vals(sy)}),")
        filters.append("NOT EXISTS (SELECT 1 FROM sy WHERE sy.label = c.label)")
    kept_where = ("WHERE " + " AND ".join(filters)) if filters else ""
    cm_vals = (
        ", ".join(
            f"('{a.replace(chr(39), chr(39) * 2)}', '{b.replace(chr(39), chr(39) * 2)}')"
            for a, b in cm.items()
        )
        or "(NULL, NULL)"
    )
    norm = normalize_topic_label_sql(topic_col)
    return f"""
WITH raw AS (SELECT {year_col} AS year, {norm} AS label FROM ({topics_sql})),
{''.join(ctes)}
cm(label, category) AS (VALUES {cm_vals}),
counts AS (SELECT year, label, count(*) AS n FROM raw GROUP BY 1, 2),
kept AS (
  SELECT c.* FROM counts c
  {kept_where}
),
mapped AS (
  SELECT k.year, coalesce(cm.category, k.label) AS category, sum(k.n) AS n
  FROM kept k LEFT JOIN cm ON k.label = cm.label
  GROUP BY 1, 2
),
pcts AS (
  SELECT year, category,
         round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY year) * 100.0, 2) AS pct
  FROM mapped
)
SELECT year, category, pct, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY year ORDER BY pct DESC, category ASC) AS rank
  FROM pcts
) WHERE rank <= {k}
"""


def topic_category_distribution_parquet_sql(
    topics_sql: str,
    year_col: str = "year",
    topic_col: str = "topic",
    k: int = 10,
) -> str:
    """DuckDB twin of :func:`topic_category_distribution` run against
    the PACKAGED full mapping tables (read_parquet on the same files
    ``load_full_mappings`` serves to Spark) — the full-data variant of
    :func:`topic_category_distribution_sql`'s inline VALUES lists."""
    dl = f"read_parquet('{mapping_table_path('delete_list')}')"
    sy = f"read_parquet('{mapping_table_path('synonym_filter')}')"
    cm = f"read_parquet('{mapping_table_path('topic_to_category')}')"
    norm = normalize_topic_label_sql(topic_col)
    return f"""
WITH raw AS (SELECT {year_col} AS year, {norm} AS label FROM ({topics_sql})),
counts AS (SELECT year, label, count(*) AS n FROM raw GROUP BY 1, 2),
kept AS (
  SELECT c.* FROM counts c
  WHERE NOT EXISTS (SELECT 1 FROM {dl} dl WHERE dl.label = c.label)
    AND NOT EXISTS (SELECT 1 FROM {sy} sy WHERE sy.label = c.label)
),
mapped AS (
  SELECT k.year, coalesce(cm.category, k.label) AS category, sum(k.n) AS n
  FROM kept k LEFT JOIN {cm} cm ON k.label = cm.label
  GROUP BY 1, 2
),
pcts AS (
  SELECT year, category,
         round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY year) * 100.0, 2) AS pct
  FROM mapped
)
SELECT year, category, pct, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY year ORDER BY pct DESC, category ASC) AS rank
  FROM pcts
) WHERE rank <= {k}
"""
