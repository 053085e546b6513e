"""Vector functions over ``array<float|double>`` embedding columns.

All JVM-side column expressions (``F.aggregate`` / ``F.zip_with`` — no
Python): the fold is sequential in array order, which makes results
bit-deterministic and lets the DuckDB oracle reproduce them exactly with
the same explicit formula (dot/(sqrt(dot_aa)*sqrt(dot_bb)) over DOUBLE[]).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    """Sequential-order dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    """Cosine similarity; 0.0 when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def l2_distance(a, b) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize(a) -> Column:
    """Unit-normalize (zero vector stays zero)."""
    n = norm(a)
    return F.when(
        n > 0, F.transform(_c(a), lambda x: x / n)
    ).otherwise(_c(a))
