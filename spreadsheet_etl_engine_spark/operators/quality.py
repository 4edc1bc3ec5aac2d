"""Declarative data-quality constraints (deequ-lite).

The reference's error channel validates RULES (``main.gs:141-299``:
unknown columns, bad operators fail loudly); this module extends the
same fail-loud philosophy to the DATA: declare constraints, get a
violation report, optionally raise when any are violated.

Scale design: every row-local constraint (not_null / in_range / matches /
accepted_values) compiles to a ``sum(CASE ...)`` inside ONE aggregation —
a single scan, map-side combinable, no shuffle beyond the final one-row
combine.  ``unique`` needs per-value counts, so it adds one shuffled
aggregation per unique-constraint on the (hashed) key — still
column-pruned and combinable.  Nulls violate only ``not_null``; range /
regex / set constraints skip them, and ``unique`` follows SQL UNIQUE
semantics: rows with a NULL key component never conflict and are
excluded from that constraint's count entirely (standard constraint
semantics — add an explicit ``not_null`` when nulls are illegal).
An empty input violates nothing: every count reports 0.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spreadsheet_etl_engine_spark.errors import EngineError


@dataclass(frozen=True)
class Constraint:
    """One declarative check.  ``kind`` ∈ not_null | in_range | matches |
    accepted_values | unique.  ``columns`` is one column for row-local
    kinds; ``unique`` accepts a composite key."""

    name: str
    kind: str
    columns: tuple[str, ...]
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    values: tuple = field(default=())


def not_null(name: str, column: str) -> Constraint:
    return Constraint(name, "not_null", (column,))


def in_range(name: str, column: str, lo: float, hi: float) -> Constraint:
    return Constraint(name, "in_range", (column,), lo=lo, hi=hi)


def matches(name: str, column: str, pattern: str) -> Constraint:
    return Constraint(name, "matches", (column,), pattern=pattern)


def accepted_values(name: str, column: str, values) -> Constraint:
    vals = tuple(values)
    if not vals:
        raise EngineError(
            f'accepted_values constraint "{name}" needs at least one value.'
        )
    if any(v is None for v in vals):
        # SQL IN-with-NULL semantics would make ~isin(...) NULL for every
        # non-listed value, sum() would skip those NULLs, and the
        # constraint would silently report 0 violations on fully invalid
        # data.  NULLs are already permitted (the check only looks at
        # non-null cells); pair with not_null to forbid them.
        raise EngineError(
            f'accepted_values constraint "{name}": None is not a legal '
            "list element (non-null cells are checked against the list; "
            "NULL cells always pass — add a not_null constraint to "
            "forbid them)"
        )
    return Constraint(name, "accepted_values", (column,), values=vals)


def unique(name: str, *columns: str) -> Constraint:
    if not columns:
        raise EngineError(
            f'unique constraint "{name}" needs at least one key column.'
        )
    return Constraint(name, "unique", tuple(columns))


def _violation_expr(c: Constraint) -> Column:
    col = F.col(c.columns[0])
    if c.kind == "not_null":
        cond = col.isNull()
    elif c.kind == "in_range":
        cond = col.isNotNull() & ~col.between(F.lit(c.lo), F.lit(c.hi))
    elif c.kind == "matches":
        cond = col.isNotNull() & ~col.rlike(c.pattern)
    elif c.kind == "accepted_values":
        cond = col.isNotNull() & ~col.isin(list(c.values))
    else:
        raise EngineError(f'Unknown constraint kind "{c.kind}" in "{c.name}".')
    # coalesce: sum() over zero rows is NULL; an empty input has 0 violations.
    return F.coalesce(F.sum(cond.cast("long")), F.lit(0).cast("long")).alias(c.name)


# Constraint names are spliced into a stack() selectExpr as SQL literals /
# backtick identifiers; restrict them so a quote or backtick can't turn a
# declaration typo into a runtime parse error.
_SAFE_NAME = re.compile(r"^[A-Za-z0-9_.:\- ]+$")


def validate_constraints(constraints: list[Constraint]) -> None:
    """Shared declaration-time checks: non-empty, unique, safe names.

    Called by every consumer (``check_constraints`` and the job
    lifecycle's observe path) so the two validation surfaces cannot
    drift — a duplicate name that fail mode rejects must not silently
    collapse two observe metrics in report mode."""
    if not constraints:
        raise EngineError("check_constraints needs at least one constraint.")
    names = [c.name for c in constraints]
    if len(set(names)) != len(names):
        raise EngineError(f"duplicate constraint names: {names}")
    for c in constraints:
        if not _SAFE_NAME.match(c.name):
            raise EngineError(
                f'Constraint name "{c.name}" contains characters outside '
                "[A-Za-z0-9_.:- ] — rename it (names are embedded in the "
                "report SQL)."
            )


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate constraints → ``(constraint, kind, n_violations, n_rows)``.

    Row-local constraints share one single-scan aggregation; each
    ``unique`` constraint contributes one additional keyed aggregation
    (violations = rows beyond the first per duplicated key value).
    """
    validate_constraints(constraints)
    row_local = [c for c in constraints if c.kind != "unique"]
    uniques = [c for c in constraints if c.kind == "unique"]

    reports: list[DataFrame] = []
    if row_local:
        agg = df.agg(
            F.count(F.lit(1)).alias("_n_rows"),
            *[_violation_expr(c) for c in row_local],
        )
        # One wide row -> one report row per constraint (stack unpivot).
        pairs = ", ".join(f"'{c.name}', '{c.kind}', `{c.name}`" for c in row_local)
        reports.append(
            agg.selectExpr(
                f"stack({len(row_local)}, {pairs}) AS "
                "(constraint, kind, n_violations)",
                "_n_rows AS n_rows",
            )
        )
    for c in uniques:
        key = (F.col(c.columns[0]) if len(c.columns) == 1
               else F.struct(*[F.col(x) for x in c.columns]))
        # SQL UNIQUE semantics: a NULL key component never conflicts —
        # drop those rows here (not_null covers missing keys) so n_rows
        # reports how many rows the uniqueness check actually saw.
        non_null = df
        for x in c.columns:
            non_null = non_null.filter(F.col(x).isNotNull())
        per_key = non_null.groupBy(key.alias("_k")).agg(F.count("*").alias("_cnt"))
        reports.append(
            per_key.agg(
                F.lit(c.name).alias("constraint"),
                F.lit("unique").alias("kind"),
                F.coalesce(F.sum(F.col("_cnt") - 1), F.lit(0))
                .cast("long").alias("n_violations"),
                F.coalesce(F.sum("_cnt"), F.lit(0))
                .cast("long").alias("n_rows"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def assert_constraints(df: DataFrame, constraints: list[Constraint]) -> None:
    """Raise :class:`EngineError` listing every violated constraint —
    the data-level analogue of the reference's fail-loud rule errors."""
    report = check_constraints(df, constraints).collect()
    bad = [r for r in report if r["n_violations"] > 0]
    if bad:
        detail = "; ".join(
            f'{r["constraint"]} ({r["kind"]}): {r["n_violations"]} violations'
            for r in bad
        )
        raise EngineError(f"Data-quality constraints violated: {detail}.")


def nonfinite_report(
    df: DataFrame,
    double_cols: tuple[str, ...] = (),
    array_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-column non-finite profile: ``(col_name, n_rows, n_null, n_nan,
    n_inf, n_finite)`` — the diagnostic an operator runs after a
    ``NON_FINITE_MEASURE`` raise (functions/numeric.py) to locate which
    measure carries NaN/±Infinity and how much of the feed is clean,
    before deciding between an ``in_range`` filter and an upstream fix.

    Scale shape: every count is a ``sum(CASE)`` inside ONE aggregation —
    a single scan of only the named columns, map-side combinable, no
    shuffle beyond the one-row combine (same design as
    :func:`check_constraints`); the per-column rows come from exploding
    the single result row, not from per-column scans.

    Scalar columns count VALUES; ``array_cols`` (array<float/double>)
    count ROWS containing at least one non-finite component, so a row
    whose vector holds both a NaN and an Infinity counts in both
    ``n_nan`` and ``n_inf`` (the four counts can overlap for arrays;
    ``n_finite`` is rows that are non-NULL with no non-finite
    component).  NaN detection uses ``isnan``; infinity uses equality
    against ±inf literals (NaN equals neither under Spark's total-order
    comparisons, so the counts never double-count a NaN as infinite).
    """
    inf = float("inf")

    def _counts(c: str, is_array: bool) -> list[Column]:
        col = F.col(c)
        if is_array:
            nan = F.exists(col, lambda x: F.isnan(x))
            isinf = F.exists(col, lambda x: (x == inf) | (x == -inf))
        else:
            nan = F.isnan(col)
            isinf = (col == inf) | (col == -inf)
        null = col.isNull()
        # coalesce: sum() over ZERO rows is NULL, but an empty feed has
        # 0 of everything (the r8 empty-slice class check_constraints
        # already handles).
        n = lambda cond, tag: F.coalesce(
            F.sum(cond.cast("long")), F.lit(0).cast("long")
        ).alias(f"{c}__{tag}")
        return [
            n(null, "null"),
            n(F.coalesce(nan, F.lit(False)), "nan"),
            n(F.coalesce(isinf, F.lit(False)), "inf"),
            n(~null & ~F.coalesce(nan | isinf, F.lit(False)), "finite"),
        ]

    cols = [(c, False) for c in double_cols] + [(c, True) for c in array_cols]
    aggs = [F.count("*").alias("__rows")]
    for c, is_arr in cols:
        aggs += _counts(c, is_arr)
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__rows").alias("n_rows"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__nan").alias("n_nan"),
            F.col(f"{c}__inf").alias("n_inf"),
            F.col(f"{c}__finite").alias("n_finite"),
        )
        for c, _ in cols
    ])
    return one.select(F.explode(rows).alias("r")).select("r.*")
