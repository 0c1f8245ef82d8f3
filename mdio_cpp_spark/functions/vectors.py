"""Vector column functions over ``array<float>`` embedding columns.

Dot products / norms / cosine via ``zip_with`` + ``aggregate`` — JVM-side
higher-order functions, no UDF, no driver collect. Elements are cast to
double *before* multiplying and summed left-to-right, which makes the result
bit-identical to the DuckDB oracle formulation
``list_sum(list_transform(range(1, len+1), i -> a[i]::DOUBLE * b[i]::DOUBLE))``.

Scale note: for top-k similarity the cross product is (queries × corpus);
keep the query side broadcastable and the corpus side partitioned — see
operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_parts(dot_col: Column, na: Column, nb: Column) -> Column:
    """Null-safe cosine from precomputed dot/norms: NULL when either norm
    is zero (direction undefined — under Spark's default ANSI mode a bare
    division would abort the whole job on the first zero vector) or when
    any element was NaN (NaN orders ABOVE every number in Spark, so a NaN
    cosine would outrank every real match and pass every >= threshold).
    NULL similarity drops out of filters and sorts last in desc rankings —
    degenerate vectors degrade instead of poisoning results."""
    denom = na * nb
    return F.nanvl(
        F.when(denom != 0, dot_col / denom), F.lit(None).cast("double")
    )


def cosine(a: Column, b: Column) -> Column:
    return cosine_parts(dot(a, b), norm(a), norm(b))
