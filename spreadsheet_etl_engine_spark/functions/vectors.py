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


def to_double(a: Column) -> Column:
    """Array pre-cast to double — hoist out of O(n^2) pair loops so the
    per-pair expression is one zip_with + one fold, nothing else."""
    return F.transform(a, lambda x: x.cast("double"))


def dot_precast(a: Column, b: Column) -> Column:
    """Dot for arrays ALREADY cast to double (same sequential fold →
    bit-identical to :func:`dot`; higher-order functions run interpreted,
    so per-element work inside a pair join dominates wall clock)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine with the zero-vector contract made explicit: a zero-norm
    side yields 0.0, not NULL — under non-ANSI division NULL cosines
    silently fail every ``>= threshold`` filter (zero vectors would never
    pair, even with each other) while still being ranked by top-k windows.
    0.0 states the same decision ("a zero vector is near nothing")
    loudly and keeps the column non-null."""
    den = norm(a) * norm(b)
    return F.when(den == F.lit(0.0), F.lit(0.0)).otherwise(dot(a, b) / den)


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d * d))


def cosine_pandas(a: Column, b: Column) -> Column:
    """Arrow-batched pandas-UDF cosine — the escape hatch when a kernel
    genuinely can't be expressed with built-ins (this one can; the expr
    version above is the default).  Batches arrive as pandas Series of
    numpy arrays; math is vectorized numpy, never per-row Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos_fn(xs, ys):
        # NULL-on-either-side → NULL, matching the expr cosine (its
        # fold over a NULL array is NULL), and a zero-row Arrow batch
        # → empty, matching _cosine_to_centroids' guard — previously
        # both died in np.stack (r15 review pass 11).
        mask = (xs.notna() & ys.notna()).to_numpy()
        if not mask.any():
            return pd.Series([None] * len(xs), dtype=object)
        xm = np.stack(xs[mask].to_numpy()).astype(np.float64)
        ym = np.stack(ys[mask].to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", xm, ym)
        norms = np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1)
        # same zero-vector contract as the expr cosine: 0.0, never NaN
        safe = np.where(norms == 0.0, 1.0, norms)
        vals = np.where(norms == 0.0, 0.0, dots / safe)
        it = iter(vals.tolist())
        return pd.Series([next(it) if ok else None for ok in mask])

    # Real (non-string) annotations: this module uses postponed annotation
    # evaluation, which pandas_udf's signature inspection cannot resolve.
    _cos_fn.__annotations__ = {"xs": pd.Series, "ys": pd.Series, "return": pd.Series}
    return pandas_udf(_cos_fn, "double")(a, b)


def hyperplane_signature(a: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one sign bit per plane, packed into
    a long.  ``planes`` is a small engine-generated list (broadcast as
    literals into the expression — no join needed).

    NULL-in/NULL-out (r15 review pass 11): a NULL vector used to fold to
    signature 0 — the same bucket as every all-negative-side vector — so
    NULL embeddings silently joined a real LSH bucket and generated
    candidate pairs; with NULL signatures the equi-join drops them (SQL
    NULL never equals NULL)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        sig = sig + F.when(dot(a, plane_col) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return F.when(a.isNull(), F.lit(None).cast("long")).otherwise(sig)
