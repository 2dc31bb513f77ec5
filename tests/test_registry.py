"""Gate-registry pinning (r5 VERDICT #3): the r4 incident silently
evicted a query from the checked set when a 51st was added. Pin the
registry size and the queries()/oracle_sql() key correspondence so
any drift fails loudly here instead of shrinking the driver gate."""

from __future__ import annotations

import __spark_entry__ as entrymod

EXPECTED_QUERIES = 50


def test_registry_size_pinned():
    qs = entrymod.queries()
    assert len(qs) == EXPECTED_QUERIES, (
        f"queries() has {len(qs)} entries, expected {EXPECTED_QUERIES} — "
        "adding/removing a gate query must update this pin deliberately"
    )


def test_every_query_has_oracle_and_vice_versa():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert qs == os_, (
        f"queries()/oracle_sql() key mismatch: only-in-queries={sorted(qs - os_)}, "
        f"only-in-oracle={sorted(os_ - qs)}"
    )


def test_oracle_sql_is_nonempty_text():
    for name, sql in entrymod.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), f"empty oracle for {name}"
