"""Build the golden crawl-order fixture (VERDICT r3 next #6).

The crawl engine's ordering contract — BFS batches under per-host
politeness caps, (depth asc, priority desc, url_hash asc, url asc)
within a batch, first-seen dedup at enqueue — was pytest-only (14
differential tests vs tests/oracle/crawler_oracle.OracleCrawler).
This tool puts it on the driver's hard signal: it runs the trusted
SEQUENTIAL oracle over the fixed GATE_WORLD (pages/seeds/politeness/
robots all deterministic, sources/pages.py) and stores the complete
(batch_id, seq, url_hash) crawl order as a packaged parquet fixture.
`oracle_sql()["crawl_order_prefix"]` reads it back via
read_parquet(), so the driver gate hash-compares the DISTRIBUTED
engine's order against the sequential executor's — the same
golden-fixture pattern the louvain gate uses.

Usage: python tools/build_crawl_golden.py [out_parquet]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openalex_collaboration_crawler_spark.operators.topics import DATA_DIR  # noqa: E402
from openalex_collaboration_crawler_spark.session import get_spark  # noqa: E402
from openalex_collaboration_crawler_spark.sources.pages import (  # noqa: E402
    GATE_WORLD,
    build_pages,
    build_politeness,
    build_robots,
    build_seeds,
)
from tests.oracle.crawler_oracle import OracleCrawler, portable_hash64  # noqa: E402


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(DATA_DIR, "crawl_order_golden.parquet")
    )
    spark = get_spark("build_crawl_golden")
    n = GATE_WORLD["n_pages"]
    page_rows = [r.asDict() for r in build_pages(spark, n_pages=n).collect()]
    politeness_rows = [
        r.asDict()
        for r in build_politeness(
            spark,
            default_per_batch=GATE_WORLD["default_per_batch"],
            hot_per_batch=GATE_WORLD["hot_per_batch"],
        ).collect()
    ]
    robots_rows = [r.asDict() for r in build_robots(spark).collect()]
    seeds = [
        (r["url"], r["priority"])
        for r in build_seeds(spark, n_pages=n, n_seeds=GATE_WORLD["n_seeds"]).collect()
    ]
    orc = OracleCrawler.from_rows(
        page_rows,
        politeness_rows,
        robots_rows,
        default_per_host=GATE_WORLD["default_per_host"],
    )
    orc.seed(seeds)
    orc.run(max_batches=GATE_WORLD["max_batches"])
    table = pa.table(
        {
            "batch_id": pa.array([b for b, _, _ in orc.order], type=pa.int32()),
            "seq": pa.array([s for _, s, _ in orc.order], type=pa.int64()),
            "url_hash": pa.array(
                [portable_hash64(u) for _, _, u in orc.order], type=pa.int64()
            ),
        }
    )
    pq.write_table(table, out)
    print(
        f"wrote {table.num_rows} crawl-order rows "
        f"({max(b for b, _, _ in orc.order)} batches) -> {out}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
