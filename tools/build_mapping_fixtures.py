"""Package the reference's topic-mapping tables as parquet DATA.

The reference ships its label-normalization inputs as python literals
(analysis/mappings.py: topics_mapping, application_domains_to_delete,
application_domains_mapping; analysis/topic_to_category.py: the 57k-row
auto-generated topic→category table). Those are public reference data,
not code — this tool extracts the literals with ``ast`` (no execution
of reference code) and writes them under
``openalex_collaboration_crawler_spark/data/`` where
``operators.topics.load_full_mappings`` picks them up.

Run once: python tools/build_mapping_fixtures.py
"""

from __future__ import annotations

import ast
import os

import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/reference/analysis"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "openalex_collaboration_crawler_spark",
    "data",
)


def extract_literals(path: str) -> dict:
    """Top-level ``name = <literal>`` assignments, via ast only."""
    tree = ast.parse(open(path, encoding="utf-8").read())
    out = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            tgt = node.targets[0]
            if isinstance(tgt, ast.Name):
                try:
                    out[tgt.id] = ast.literal_eval(node.value)
                except ValueError:
                    pass  # non-literal assignment — skip
    return out


def write_labels(name: str, labels: list[str]) -> None:
    # dict-sourced "lists" can repeat keys; preserve first-seen order
    seen, uniq = set(), []
    for x in labels:
        if x not in seen:
            seen.add(x)
            uniq.append(x)
    pq.write_table(pa.table({"label": uniq}), os.path.join(OUT, f"{name}.parquet"))
    print(f"{name}: {len(uniq)} rows")


def write_map(name: str, mapping: dict[str, str]) -> None:
    items = sorted(mapping.items())
    pq.write_table(
        pa.table(
            {"label": [k for k, _ in items], "category": [v for _, v in items]}
        ),
        os.path.join(OUT, f"{name}.parquet"),
    )
    print(f"{name}: {len(items)} rows")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    m = extract_literals(os.path.join(REF, "mappings.py"))
    t = extract_literals(os.path.join(REF, "topic_to_category.py"))
    write_labels("delete_list", m["application_domains_to_delete"])
    # synonym FILTER = the keys of topics_mapping (01_metadata_analysis
    # .py:343 filters on membership); the value map is kept too
    write_labels("synonym_filter", list(m["topics_mapping"].keys()))
    write_map("synonym_map", m["topics_mapping"])
    write_map("application_domain_map", m["application_domains_mapping"])
    write_map("topic_to_category", t["topic_to_category"])


if __name__ == "__main__":
    main()
