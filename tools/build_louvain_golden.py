"""Build the golden Louvain membership fixture (VERDICT r3 next #2).

The engine's Louvain solve is deterministic (seed=42, LCG shuffle,
graphstats._louvain_python — trusted by tests/test_communities.py).
This tool computes the membership for the sf0.01 backbone ONCE,
entirely outside Spark: the backbone edge list is evaluated by DuckDB
from the same SQL template the gate uses, and the pure-python solver
labels it. The result lands as a packaged parquet fixture that the
`louvain` oracle_sql() reads back via read_parquet() — giving the
louvain gate a full rows+schema+hash DuckDB comparison (Spark's
distributed applyInPandas solve vs the offline solve on
independently-derived edges).

Usage: python tools/build_louvain_golden.py [sf_dir] [out_parquet]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openalex_collaboration_crawler_spark.operators.edges import (  # noqa: E402
    PAIRWISE_EDGES_SQL_TEMPLATE,
    WEIGHTED_EDGES_SQL_TEMPLATE,
)
from openalex_collaboration_crawler_spark.operators.graphstats import (  # noqa: E402
    _louvain_python,
)
from openalex_collaboration_crawler_spark.operators.topics import DATA_DIR  # noqa: E402
from openalex_collaboration_crawler_spark.sources.tables import (  # noqa: E402
    COLLAB_MODEL_SQL,
    TABLES,
)

BACKBONE_MIN_WEIGHT = 3  # must match _q_louvain's filter


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(DATA_DIR, "louvain_golden_sf001.parquet")
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    edges_sql = WEIGHTED_EDGES_SQL_TEMPLATE.format(
        edges=PAIRWISE_EDGES_SQL_TEMPLATE.format(authorships=COLLAB_MODEL_SQL)
    )
    rows = con.execute(
        f"SELECT author1, author2, weight FROM ({edges_sql}) "
        f"WHERE weight >= {BACKBONE_MIN_WEIGHT}"
    ).fetchall()
    print(f"backbone edges: {len(rows)}")
    comm = _louvain_python([(u, v, float(w)) for u, v, w in rows], seed=42)
    nodes = sorted(comm)
    table = pa.table(
        {
            "node": pa.array(nodes, type=pa.int64()),
            "community": pa.array([comm[n] for n in nodes], type=pa.int64()),
        }
    )
    pq.write_table(table, out)
    print(f"wrote {len(nodes)} membership rows -> {out}")


if __name__ == "__main__":
    main()
