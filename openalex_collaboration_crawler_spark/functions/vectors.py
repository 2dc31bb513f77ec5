"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions only (``zip_with`` + ``aggregate``),
so dot products / cosine run JVM-side inside codegen — no Python.
DuckDB mirrors are written as the *same* left-fold over the same
doubles so both engines execute the identical IEEE operation
sequence (needed for exact differential hashing; we still round at
query edges for defense in depth).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_sql(a: str, b: str) -> str:
    prods = (
        f"list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))"
    )
    return f"list_aggregate({prods}, 'sum')"


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def lsh_bucket(a: Column | str, n_planes: int = 8, dim: int = 16, seed: int = 42) -> Column:
    """Sign-random-projection LSH bucket id (int in [0, 2^n_planes)).

    Hyperplanes are deterministic pseudo-random ±1 entries derived from
    (seed, plane, coord) — reproducible anywhere, including SQL. At
    scale this turns O(N²) similarity search into per-bucket searches
    after a single shuffle on the bucket id.
    """
    planes = _planes(n_planes, dim, seed)
    acc = F.lit(0)
    for p, coeffs in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                _c(a),
                F.array(*[F.lit(float(c)) for c in coeffs]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        acc = acc + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def lsh_bucket_sql(a: str, n_planes: int = 8, dim: int = 16, seed: int = 42) -> str:
    planes = _planes(n_planes, dim, seed)
    terms = []
    for p, coeffs in enumerate(planes):
        arr = "[" + ", ".join(f"{float(c)!r}" for c in coeffs) + "]"
        prods = (
            f"list_transform(list_zip({a}, {arr}), "
            f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))"
        )
        proj = f"list_aggregate({prods}, 'sum')"
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _planes(n_planes: int, dim: int, seed: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from a tiny LCG (no numpy needed)."""
    out = []
    state = seed & 0x7FFFFFFF or 1
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append(1 if (state >> 16) & 1 else -1)
        out.append(row)
    return out
