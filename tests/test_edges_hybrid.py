"""pairwise_edges hybrid path: array pair-gen vs join fallback parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from openalex_collaboration_crawler_spark.operators.edges import pairwise_edges


def _authorships(spark):
    rows = []
    # works with 1..8 authors, plus one "mega" work with 20 authors,
    # plus duplicate authorship rows (multiplicity semantics)
    w = 0
    for k in (1, 2, 3, 8, 20):
        w += 1
        for a in range(k):
            rows.append((w, 100 + a, 1990 + w))
    rows.append((2, 100, 1992))  # duplicate authorship in work 2
    return spark.createDataFrame(rows, "work_id long, author long, year long")


def test_hybrid_cap_invariance(spark):
    """Output multiset must be identical whatever the cap routes
    through the array path vs the join fallback."""
    au = _authorships(spark)

    def multiset(cap):
        out = pairwise_edges(au, small_work_cap=cap).collect()
        ms = {}
        for r in out:
            key = (r["year"], r["work_id"], r["a1"], r["a2"])
            ms[key] = ms.get(key, 0) + 1
        return ms

    all_array = multiset(cap=1000)   # everything on the array path
    all_join = multiset(cap=0)       # everything on the join fallback
    mixed = multiset(cap=8)          # split routing
    assert all_array == all_join == mixed

    # semantics spot-checks: solo self-loop, strict a1<a2, duplicate
    # authorship multiplies pairs
    assert (1991, 1, 100, 100) in all_array            # solo work
    assert all(a1 <= a2 for (_, _, a1, a2) in all_array)
    assert all_array[(1992, 2, 100, 101)] == 2         # dup author ×2
