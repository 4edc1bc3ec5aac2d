"""Numeric domain guards shared by every exact-decimal accumulation path."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Largest finite double: abs(x) > _DBL_MAX is the ONE-comparison
# non-finite test under Spark's total-order comparisons (NaN compares
# larger than +Infinity — upstream NaN semantics), while NULL > x yields
# NULL and falls through the CASE untouched.
_DBL_MAX = 1.7976931348623157e308


def finite_or_fail(col: Column, what: str) -> Column:
    """Fail-loud guard for the NON-FINITE boundary of the exact-decimal
    domain (r9 edge-family-9 find).

    The engine's deterministic sums accumulate doubles in DECIMAL so the
    result is order-independent, with a documented fail-loud domain
    contract: ANSI decimal casts throw on FINITE overflow
    (NUMERIC_VALUE_OUT_OF_RANGE).  But Spark's ANSI cast silently
    returns NULL for NaN and ±Infinity (upstream cast semantics —
    only the long/cents route raises CAST_OVERFLOW on them), so one
    poison row (an upstream 0/0, log(0), or float overflow) would
    silently VANISH from the sum and shrink every count(value) divisor
    with it.  DuckDB's equivalent cast fails loud (ConversionException),
    so unguarded the two engines also diverge in failure behavior.

    Wrap the double BEFORE the decimal cast: a non-finite value raises
    USER_RAISED_EXCEPTION naming the measure; NULLs pass through
    untouched (``NULL > x`` is NULL, so the CASE falls to ELSE — SQL
    NULL-in/NULL-out preserved).  Cost: one abs + one compare per row
    inside whole-stage codegen — ``abs(x) > DBL_MAX`` catches ±Infinity
    AND NaN in a single predicate because Spark's comparisons are
    total-ordered (NaN compares larger than +Infinity).  The interleaved
    A/B could not resolve the guard's cost from run-to-run noise on the
    0.4-1.0s sf0.1 agg lines (BENCH_NOTES r9c — the two-predicate
    isnan-or form it replaced read up to ~12% there, also mostly
    noise).  The sanctioned upstream filter for feeds
    where non-finite values are EXPECTED is an ``in_range`` quality
    constraint (operators/quality.py); this guard is the engine-side
    backstop.  Pinned by
    tests/test_ext_operators.py::test_nonfinite_measure_fails_loud
    and the edge-sweep fail-loud parity pin on embedding_cluster_stats.
    """
    return F.when(
        F.abs(col) > _DBL_MAX,
        F.raise_error(
            F.concat(F.lit(f"NON_FINITE_MEASURE: {what} = "), col.cast("string"))
        ),
    ).otherwise(col)
