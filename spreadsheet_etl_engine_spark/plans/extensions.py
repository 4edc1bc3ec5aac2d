"""Map-DSL v2: multi-table joins and aggregation as rule kinds.

The reference lists "Multi-sheet joins" and an "Advanced expression parser"
as roadmap items (``/root/reference/README.md:121-122``) without defining
syntax, so this extension keeps the reference's idiom — one rule per row,
``<name>[<col>]`` references, prefix-classified instructions — and adds:

* ``_join:<alias>`` rules: ``on: src[left_col] == <alias>[right_col]
  how: inner|left|right|semi|anti [broadcast]`` — joins the table bound to
  ``alias`` (from the caller-provided table dict) in declaration order.
  ``broadcast`` marks a dimension-sized right side (at 100 TB the
  difference between a map-side join and a full shuffle).  Post-join
  the frame is flat and ``alias[col]`` normalizes to ``src[col]``, so
  a right-side column whose name already exists in the frame is
  unreachable by any rule — such columns are DROPPED at join time
  (left wins), never kept as ambiguous duplicates.
* ``_group:<name>`` rule: ``by: src[col1], src[col2]`` — switches the
  output columns to aggregation mode.
* aggregate output columns: instruction ``agg:<fn>`` or
  ``agg:<fn>:src[col]`` with fn ∈ count, countd, sum, sumd, min, max,
  avgd.  ``sumd``/``avgd`` accumulate in DECIMAL(18,2) and cast back to
  double — the engine-reproducible form for unordered money sums.
* ``_having:<name>`` rules: post-aggregation filters in the v2 expression
  grammar, referencing aggregate output columns (``src[n_customers] >= 10``).
* the roadmap's "Advanced expression parser": ``&&`` and parenthesized
  grouping inside ``eval:`` expressions (filters and having).  ``&&``
  binds tighter than ``||`` (JS precedence); ``( )`` overrides grouping
  with arbitrary nesting.  v1 entry points are untouched: the v1 grammar
  deliberately excludes both constructs
  (``docs/expression-language.md:170-176``), where ``&&``/paren text
  falls into the silent-false / parseFloat-prefix semantics of the
  reference evaluator.  A run of 3+ ``&`` fails loud, matching the v1
  malformed-operator guard; unbalanced parens and text butted against a
  group (``a == (1)``) raise ``ExpressionSyntaxError`` — structural
  mistakes are never silent.  Operand semantics (parseFloat, JS trim,
  quote strip, silent-false conditions) are shared with v1 because every
  leaf compiles through the same condition compiler.
* ``_sort:<name>``: ``by: src[col] [asc|desc], ...`` and
  ``_limit:<name>``: ``<n>`` — applied after projection/aggregation
  (together they plan as TakeOrderedAndProject, never a global sort).
  NULL keys order LAST in both directions (pinned — Spark's bare asc
  defaults NULLS FIRST where most engines default LAST, and with
  ``_limit:`` that selects different ROWS per engine).
* ``_distinct:<name>`` (instruction empty): full-row DISTINCT over the
  projected output, applied before sort/limit.  Only the full-row form
  exists — subset-distinct keeps an arbitrary survivor per key, which is
  nondeterministic on both engines (dedup-with-policy belongs to the
  dedup operators / ``exact_dedup``).

Everything else (filters, DIRECT/CONSTANT/FORMULA columns, comments,
validation) is v1: after the joins run, all columns share one namespace and
``alias[col]`` normalizes to ``src[col]`` before the v1 compiler sees it.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spreadsheet_etl_engine_spark.errors import EngineError, MissingColumnError
from spreadsheet_etl_engine_spark.functions.numeric import finite_or_fail
from spreadsheet_etl_engine_spark.plans.compiler import MappingCompiler
from spreadsheet_etl_engine_spark.plans.parser import (
    COMMENT_PREFIX,
    EVAL_PREFIX,
    FILTER_PREFIX,
    BoolAnd,
    BoolOr,
    MappingSpec,
    parse_filter_expression_v2,
    parse_mapping,
)

JOIN_PREFIX = "_join:"
GROUP_PREFIX = "_group:"
HAVING_PREFIX = "_having:"
SORT_PREFIX = "_sort:"
LIMIT_PREFIX = "_limit:"
DISTINCT_PREFIX = "_distinct:"
AGG_PREFIX = "agg:"

_JOIN_RE = re.compile(
    r"^on:\s*src\[(?P<left>[^\]]+)\]\s*==\s*(?P<alias>\w+)\[(?P<right>[^\]]+)\]"
    r"\s*how:\s*(?P<how>inner|left|right|semi|anti)(?P<bcast>\s+broadcast)?\s*$"
)
_AGG_RE = re.compile(r"^agg:(?P<fn>count|countd|sum|sumd|min|max|avgd)(?::(?P<arg>.*))?$")

_HOW_MAP = {"inner": "inner", "left": "left", "right": "right",
            "semi": "left_semi", "anti": "left_anti"}


@dataclass(frozen=True)
class JoinRule:
    name: str
    alias: str
    left_col: str
    right_col: str
    how: str
    broadcast: bool


@dataclass(frozen=True)
class AggColumn:
    name: str
    fn: str
    arg: str | None


@dataclass(frozen=True)
class SortKey:
    column: str
    descending: bool


@dataclass(frozen=True)
class MappingSpecV2:
    joins: tuple[JoinRule, ...]
    group_by: tuple[str, ...]
    aggs: tuple[AggColumn, ...]
    base: MappingSpec  # v1-parsed rules (filters kept for validation only)
    # Post-agg filters: (author rule name, parsed v2 boolean tree).
    # Parsed at PARSE time so a syntax error surfaces with the author's
    # rule name alongside every other rule error, not at run time under
    # a synthetic index (r14 review pass 10).
    having: tuple = ()
    sort_keys: tuple[SortKey, ...] = ()
    limit: int | None = None
    distinct: bool = False
    # v2-parsed eval filters: one boolean tree per rule (``&&`` + parens
    # — the roadmap's "Advanced expression parser"; leaves are v1
    # Comparisons).  ``base.filters`` holds the same rules under v1
    # parsing for the shared delimiter/operator/src-ref validation;
    # execution uses THESE.
    filters_v2: tuple = ()  # one BoolNode tree per _filter: eval rule


def _normalize_refs(text: str, aliases: Iterable[str]) -> str:
    """``alias[col]`` → ``src[col]``: post-join there is one flat
    namespace, so the v1 compiler handles every reference."""
    for alias in aliases:
        text = re.sub(rf"\b{re.escape(alias)}\[", "src[", text)
    return text


def parse_mapping_v2(
    rules: Iterable[tuple[str, str]],
    tables: dict[str, Sequence[str]],
    *,
    source: str = "src",
) -> MappingSpecV2:
    """Parse v2 rules.  ``tables`` maps alias → column list (the source
    table's alias is ``source``; joined aliases must appear in ``tables``)."""
    joins: list[JoinRule] = []
    group_by: list[str] = []
    aggs: list[AggColumn] = []
    having: list[str] = []
    sort_keys: list[SortKey] = []
    limit: int | None = None
    distinct = False
    filters_v2: list = []  # BoolNode trees (parser.parse_filter_expression_v2)
    v1_rules: list[tuple[str, str]] = []
    aliases = [a for a in tables if a != source]

    visible_cols = list(tables[source])
    for raw_name, raw_instruction in rules:
        name = str(raw_name).strip() if raw_name is not None else ""
        if not name or name.startswith(COMMENT_PREFIX):
            continue
        instruction = str(raw_instruction).strip() if raw_instruction is not None else ""

        if name.startswith(JOIN_PREFIX):
            m = _JOIN_RE.match(instruction)
            if not m:
                raise EngineError(
                    f'Invalid join instruction in rule "{name}": expected '
                    f'"on: src[L] == alias[R] how: inner|left|right|semi|anti '
                    f'[broadcast]", got "{instruction}".'
                )
            alias = m.group("alias")
            if alias not in tables:
                raise EngineError(f'Unknown table alias "{alias}" in rule "{name}".')
            if m.group("left") not in visible_cols:
                raise MissingColumnError(m.group("left"), name)
            if m.group("right") not in tables[alias]:
                raise MissingColumnError(m.group("right"), name)
            how = _HOW_MAP[m.group("how")]
            right_col = m.group("right")
            joins.append(
                JoinRule(
                    name=name,
                    alias=alias,
                    left_col=m.group("left"),
                    right_col=right_col,
                    how=how,
                    broadcast=bool(m.group("bcast")),
                )
            )
            if how not in ("left_semi", "left_anti"):
                # The right key column is dropped after the join when its
                # name collides with an already-visible column (natural-key
                # joins) — mirrored in run_mapping_v2.
                incoming = [c for c in tables[alias] if c != right_col]
                visible_cols = visible_cols + incoming
                if right_col not in visible_cols:
                    visible_cols = visible_cols + [right_col]
            continue

        if name.startswith(GROUP_PREFIX):
            body = instruction
            if body.startswith("by:"):
                body = body[3:]
            for part in body.split(","):
                part = _normalize_refs(part.strip(), aliases)
                m = re.fullmatch(r"src\[([^\]]+)\]|(\w+)", part)
                if not m:
                    raise EngineError(f'Invalid group key "{part}" in rule "{name}".')
                col = m.group(1) or m.group(2)
                if col not in visible_cols:
                    raise MissingColumnError(col, name)
                group_by.append(col)
            continue

        if name.startswith(HAVING_PREFIX):
            body = _normalize_refs(instruction, aliases)
            if body.startswith("eval:"):
                body = body[len("eval:"):].strip()
            # Parse now: syntax errors carry the AUTHOR'S rule name and
            # fail at parse time with the rest of the spec (r14 review
            # pass 10 — previously deferred to run time as _having:<i>).
            having.append((name, parse_filter_expression_v2(body, name)))
            continue

        if name.startswith(SORT_PREFIX):
            for part in _normalize_refs(instruction, aliases).removeprefix("by:").split(","):
                m = re.fullmatch(
                    r"\s*(?:src\[([^\]]+)\]|(\w+))(?:\s+(asc|desc))?\s*", part, re.IGNORECASE
                )
                if not m:
                    raise EngineError(f'Invalid sort key "{part.strip()}" in rule "{name}".')
                sort_keys.append(
                    SortKey(
                        column=m.group(1) or m.group(2),
                        descending=(m.group(3) or "asc").lower() == "desc",
                    )
                )
            continue

        if name.startswith(LIMIT_PREFIX):
            if not instruction.isdigit():
                raise EngineError(f'Limit must be a non-negative integer in rule "{name}".')
            limit = int(instruction)
            continue

        if name.startswith(DISTINCT_PREFIX):
            if instruction:
                raise EngineError(
                    f'_distinct takes no instruction in rule "{name}" — only '
                    "full-row DISTINCT is supported (subset dedup-with-policy "
                    "is nondeterministic; use the dedup operators instead)."
                )
            distinct = True
            continue

        instruction = _normalize_refs(instruction, aliases)
        if name.startswith(FILTER_PREFIX) and instruction.startswith(EVAL_PREFIX):
            # v2 grammar (``&&`` enabled) drives execution; the rule also
            # rides through the v1 parse below for the shared delimiter /
            # malformed-operator / src-ref validation.
            filters_v2.append(
                parse_filter_expression_v2(instruction[len(EVAL_PREFIX):], name)
            )
            v1_rules.append((name, instruction))
            continue
        m = _AGG_RE.match(instruction)
        if m and not name.startswith(FILTER_PREFIX):
            arg = m.group("arg")
            if arg:
                arg = arg.strip()
                am = re.fullmatch(r"src\[([^\]]+)\]", arg)
                if not am:
                    raise EngineError(
                        f'Aggregate argument must be src[col] in rule "{name}", got "{arg}".'
                    )
                if am.group(1) not in visible_cols:
                    raise MissingColumnError(am.group(1), name)
                arg = am.group(1)
            elif m.group("fn") != "count":
                raise EngineError(f'Aggregate "{m.group("fn")}" needs src[col] in rule "{name}".')
            aggs.append(AggColumn(name=name, fn=m.group("fn"), arg=arg))
            continue

        v1_rules.append((name, instruction))

    base = parse_mapping(v1_rules, visible_cols, require_output=not aggs)
    if group_by and not aggs:
        raise EngineError("A _group: rule requires at least one agg: output column.")
    if having and not aggs:
        raise EngineError("A _having: rule requires an aggregating mapping.")
    # Validate sort keys so a typo'd key raises the engine's
    # MissingColumnError with rule context instead of a raw Spark
    # UNRESOLVED_COLUMN at run time (r14 review pass 10; every other
    # column reference in the grammar already fails this way).  The
    # namespace: grouped mappings can only order by group keys + agg
    # names, while projections can also order by any PRE-projection
    # column (SQL's ORDER-BY-hidden-column; Spark resolves it through
    # the Project) — except under _distinct:, where Spark would resolve
    # a hidden key as dropDuplicates(output).orderBy(<an arbitrary
    # surviving row's value>) — run-dependent order, the same
    # nondeterminism class as the unsorted-limit rejection above
    # (measured: Deduplicate[k] over Project[k,v] sorts by whichever v
    # survives per k) — so only output names are legal there.
    if aggs:
        sortable = set(group_by) | {a.name for a in aggs}
    elif distinct:
        sortable = set(base.output_names)
    else:
        sortable = set(base.output_names) | set(visible_cols)
    for k in sort_keys:
        if k.column not in sortable:
            raise MissingColumnError(k.column, "_sort:")
    if limit is not None and not sort_keys:
        # A bare .limit(n) keeps whichever partitions' rows arrive first —
        # nondeterministic across runs, AQE layouts, and task retries
        # (r9 re-execution review).  Same fail-loud stance as the
        # subset-distinct rejection above; ties at the sort boundary
        # remain the author's responsibility (declare a total order).
        raise EngineError(
            "A _limit: rule requires a _sort: rule — an unsorted limit "
            "keeps an arbitrary, run-dependent subset of rows."
        )
    return MappingSpecV2(
        joins=tuple(joins), group_by=tuple(group_by), aggs=tuple(aggs), base=base,
        having=tuple(having), sort_keys=tuple(sort_keys), limit=limit,
        distinct=distinct, filters_v2=tuple(filters_v2),
    )


def _compile_expression_v2(compiler: MappingCompiler, node) -> Column | None:
    """Recursive compile of the v2 boolean tree (``&&`` binds tighter
    than ``||``, parens override).  Every leaf compiles through the v1
    condition compiler, so operand semantics (parseFloat, JS trim, quote
    strip, silent-false) are identical in both grammars — and Catalyst
    folds the whole tree into one scan-stage predicate exactly as it
    does for the flat grammar."""
    if isinstance(node, BoolOr):
        pred: Column | None = None
        for child in node.children:
            c = _compile_expression_v2(compiler, child)
            pred = c if pred is None else (pred | c)
        return pred
    if isinstance(node, BoolAnd):
        pred = None
        for child in node.children:
            c = _compile_expression_v2(compiler, child)
            pred = c if pred is None else (pred & c)
        return pred
    return compiler.compile_condition(node)


def _agg_expr(a: AggColumn) -> Column:
    col = F.col(a.arg) if a.arg else None
    if a.fn == "count":
        return (F.count(col) if col is not None else F.count("*")).alias(a.name)
    if a.fn == "countd":
        return F.countDistinct(col).alias(a.name)
    if a.fn == "sum":
        return F.sum(col).alias(a.name)
    if a.fn == "sumd":
        return (F.sum(finite_or_fail(col, a.arg).cast("decimal(18,2)"))
                .cast("double").alias(a.name))
    if a.fn == "avgd":
        return (F.sum(finite_or_fail(col, a.arg).cast("decimal(18,2)"))
                .cast("double") / F.count(col)).alias(a.name)
    if a.fn == "min":
        return F.min(col).alias(a.name)
    return F.max(col).alias(a.name)


def run_mapping_v2(
    tables: dict[str, DataFrame],
    rules: Iterable[tuple[str, str]],
    *,
    source: str = "src",
    mode: str = "typed",
) -> DataFrame:
    """Execute a v2 mapping: joins (declaration order) → filters →
    projection or grouped aggregation."""
    spec = parse_mapping_v2(
        rules, {alias: df.columns for alias, df in tables.items()}, source=source
    )
    if mode == "fidelity":
        # Same getDisplayValues NULL→"" semantics as run_mapping, applied
        # to the source AND every joined table BEFORE joining — so blank
        # join keys match each other the way blank display cells compare
        # equal.  An OUTER-join miss then manufactures fresh NULLs in
        # right-side columns; those are re-blanked per join below via
        # DataFrame-qualified references (a name-based whole-frame fill
        # would raise AMBIGUOUS_REFERENCE whenever both sides share an
        # unreferenced column name).
        from spreadsheet_etl_engine_spark.plans.runner import fidelity_fill

        tables = {alias: fidelity_fill(t) for alias, t in tables.items()}
    df = tables[source]
    for j in spec.joins:
        right = tables[j.alias]
        if j.broadcast:
            right = F.broadcast(right)
        # RIGHT joins need to tell a join-MISS left row apart from a
        # matched left row whose column is genuinely NULL (coalesce
        # cannot — r8 review finding: it silently substituted the right
        # frame's value for a real left NULL).  A never-NULL marker on
        # the left frame is NULL post-join exactly on right-only rows.
        lmark = None
        if j.how == "right":
            lmark = "_v2_left_matched"
            while lmark in df.columns or lmark in right.columns:
                lmark += "_"
            df = df.withColumn(lmark, F.lit(True))
        # DataFrame-qualified keys: unqualified F.col would be ambiguous
        # whenever both sides share the key name (natural-key joins).
        joined = df.join(right, df[j.left_col] == right[j.right_col], j.how)
        if j.how in ("left_semi", "left_anti"):
            df = joined
            continue
        # Post-join the frame is flat and ``alias[col]`` normalizes to
        # ``src[col]`` — a right column whose name collides with an
        # existing one could never be referenced distinctly, so the
        # LEFT side wins and the right duplicate is dropped (keeping it
        # would only plant AMBIGUOUS_REFERENCE mines for every later
        # by-name resolution, including fidelity's header indirection).
        # On a RIGHT join, a right-only row has NULLs in every LEFT
        # column, so a colliding column (the natural join key above all)
        # falls back to the right side's value ONLY on unmatched rows
        # (marker NULL) — left-wins where the left matched, genuine left
        # NULLs preserved, never a lost row identity.  The fallback
        # requires both sides to share the column's type (a single
        # output column has one type; mixing them would force a runtime
        # cast that can throw under ANSI — r8 review finding), else
        # plain left-wins applies.  Fidelity's NULL->"" blank-cell
        # contract extends to the LEFT frame's string columns (they are
        # the join-miss cells here; genuine blanks were already ""-
        # filled pre-join).
        lcols = []
        for f in df.schema.fields:
            if f.name == lmark:
                continue
            col = df[f.name]
            if j.how == "right":
                if (
                    f.name in right.columns
                    and f.dataType == right.schema[f.name].dataType
                ):
                    col = F.when(df[lmark].isNotNull(), col).otherwise(
                        right[f.name]
                    )
                if mode == "fidelity" and f.dataType.simpleString() == "string":
                    col = F.coalesce(col, F.lit(""))
            lcols.append(col.alias(f.name))
        rcols = []
        for f in right.schema.fields:
            if f.name in df.columns:
                continue
            col = right[f.name]
            if mode == "fidelity" and f.dataType.simpleString() == "string":
                # Join-miss cells are blank display cells: "" not NULL.
                col = F.coalesce(col, F.lit(""))
            rcols.append(col.alias(f.name))
        df = joined.select(*lcols, *rcols)

    compiler = MappingCompiler(df, mode=mode)
    # Filters run under the v2 grammar (``&&`` enabled); AND across rules
    # as in v1.  spec.base.filters carries the same rules v1-parsed for
    # validation only.
    predicate: Column | None = None
    for tree in spec.filters_v2:
        p = _compile_expression_v2(compiler, tree)
        if p is not None:
            predicate = p if predicate is None else (predicate & p)
    if predicate is not None:
        df = df.filter(predicate)

    if spec.aggs:
        keys = [F.col(k) for k in spec.group_by]
        out = df.groupBy(*keys).agg(*[_agg_expr(a) for a in spec.aggs])
        if spec.having:
            having_compiler = MappingCompiler(out, mode=mode)
            for _name, tree in spec.having:
                pred = _compile_expression_v2(having_compiler, tree)
                if pred is not None:
                    out = out.filter(pred)
    else:
        out = df.select(*compiler.compile_columns(spec.base))
    if spec.distinct:
        # Full-row distinct: map-side-combinable hash agg on all output
        # columns (Catalyst plans dropDuplicates as partial+final agg).
        out = out.dropDuplicates()
    if spec.sort_keys:
        # NULLS LAST pinned in BOTH directions (r10 review pass 6 — the
        # same latent-divergence class as the r9 window pins): Spark's
        # bare asc defaults NULLS FIRST while DuckDB/most engines default
        # NULLS LAST, so a v2 sort on a NULL-able key would order — and
        # with _limit:, SELECT — different rows per engine.  desc already
        # defaults NULLS LAST in both; pinned anyway so the contract is
        # explicit, not inherited.
        out = out.orderBy(
            *[F.desc_nulls_last(k.column) if k.descending
              else F.asc_nulls_last(k.column) for k in spec.sort_keys]
        )
    if spec.limit is not None:
        out = out.limit(spec.limit)
    return out
