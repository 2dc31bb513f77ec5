"""Column-expression library (JVM-side, codegen-friendly).

Everything here returns ``pyspark.sql.Column`` built from built-in
functions — no Python UDFs — so expressions stay inside whole-stage
codegen and are portable to an ANSI-SQL oracle (DuckDB) for
differential testing.
"""

from openalex_collaboration_crawler_spark.functions.hashing import (  # noqa: F401
    portable_hash64,
    portable_hash64_sql,
)
from openalex_collaboration_crawler_spark.functions.url import (  # noqa: F401
    canonicalize_url,
    url_hash,
    url_host,
)
