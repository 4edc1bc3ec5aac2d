"""Vector column functions for embedding similarity.

All pure ``Column`` expressions over ``array<float>`` columns: elements are
cast to double *before* multiplying (each float fits exactly in a double,
so products are exact and the sequential fold is engine-reproducible).
UDF-free — these run JVM-side inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d * d))


def hyperplane_signature(a: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one sign bit per plane, packed into
    a long.  ``planes`` is a small engine-generated list (broadcast as
    literals into the expression — no join needed)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        sig = sig + F.when(dot(a, plane_col) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return sig
