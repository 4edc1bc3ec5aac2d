"""Map-rule DSL parser: rule table → :class:`MappingSpec` IR.

Reference semantics (every behavior cited into ``/root/reference``):

* A mapping is a table of rules: column A = rule name, column B = instruction
  string (``main.gs:186-200``).  Row 0 of a raw map *table* is a header and
  skipped; rows whose name starts ``//`` are comments and dropped; rows with
  an empty name are dropped (``main.gs:190-193``).
* Rule names starting ``_filter:`` are filter rules; an instruction starting
  ``eval:`` marks an evaluable predicate, anything else is a no-op filter
  that passes every row (``main.gs:221-226``, ``main.gs:71-72``).
* Output rules classify by instruction prefix: ``constant:`` → CONSTANT,
  ``formula:`` → FORMULA, otherwise DIRECT (``main.gs:227-245``).
* Delimiters ``[``/``]`` must balance in every instruction
  (``main.gs:172-184``); every ``src[X]`` must name an existing source
  column (``main.gs:204-219``) — both are parse-time errors.
* Filter expressions are ``||``-disjunctions of binary comparisons with
  operators ``== != >= <= > <`` detected by first match in that fixed order
  (``main.gs:261-280``); runs of 3+ operator chars are an error
  (``main.gs:266-271``).  Conditions with no operator, or whose operand
  count ≠ 2 after splitting, are *silently false* (``main.gs:282,287``).

The parser is pure Python — no Spark import — so the grammar is unit- and
property-testable without a session.  Compilation to Spark ``Column``
expressions lives in :mod:`spreadsheet_etl_engine_spark.plans.compiler`.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Sequence
from dataclasses import dataclass, field
from enum import Enum

from spreadsheet_etl_engine_spark.errors import (
    ExpressionSyntaxError,
    InvalidOperatorError,
    MissingColumnError,
    NoOutputColumnsError,
    UnbalancedDelimiterError,
)

# Rule-name / instruction prefixes (reference ``main.gs:12-20``).
FILTER_PREFIX = "_filter:"
COMMENT_PREFIX = "//"
EVAL_PREFIX = "eval:"
CONSTANT_PREFIX = "constant:"
FORMULA_PREFIX = "formula:"

# Comparison operators in *detection order* (reference ``main.gs:273-280``:
# first substring match wins, so `>=` is found before `>`).
OPERATORS: tuple[str, ...] = ("==", "!=", ">=", "<=", ">", "<")

# ECMA-262 StrWhiteSpace (what JS ``trim()``/``parseFloat`` strip): NOT
# Python's strip set — FS/GS/RS/US (U+001C-001F) and NEL (U+0085) stay,
# BOM (U+FEFF) goes.  Operand literals must trim with THIS set or a BOM
# pasted into a rule diverges from the reference (cell values already go
# through the compiled js_trim_col; this is the literal-side twin).
# Mirrors tests/reference_impl.py::_STR_WHITESPACE and the compiled
# class in plans/compiler.py.
JS_STR_WHITESPACE = (
    " \t\n\r\v\f\u00a0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000\ufeff"
)


# Malformed-operator guard (reference ``main.gs:266``).
_INVALID_OP_RE = re.compile(r"[=><!]{3,}|[><]{2,}")

# ``src[...]`` reference extraction (reference ``main.gs:204-209``; design
# note on avoiding catastrophic backtracking:
# ``docs/expression-language.md:244-259``).
SRC_REF_RE = re.compile(r"src\[([^\]]+)\]")
SELF_REF_RE = re.compile(r"self\[([^\]]+)\]")


class ColumnKind(str, Enum):
    DIRECT = "DIRECT"
    CONSTANT = "CONSTANT"
    FORMULA = "FORMULA"


@dataclass(frozen=True)
class Comparison:
    """One binary comparison inside a filter expression.

    ``op is None`` ⇒ the condition had no recognized operator and is
    silently false (reference ``main.gs:282``).  ``malformed`` ⇒ the
    operator appeared more than once so the operand split produced ≠ 2
    parts — also silently false (reference ``main.gs:287``).
    """

    raw: str
    op: str | None = None
    left: str | None = None
    right: str | None = None
    malformed: bool = False

    @property
    def always_false(self) -> bool:
        return self.op is None or self.malformed


@dataclass(frozen=True)
class FilterRule:
    """A ``_filter:`` rule.  ``conditions`` empty ⇔ non-eval no-op filter."""

    name: str
    is_eval: bool
    instruction: str
    conditions: tuple[Comparison, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class OutputColumn:
    name: str
    kind: ColumnKind
    instruction: str


@dataclass(frozen=True)
class MappingSpec:
    """Parsed mapping: conjunction of filters + ordered projection list."""

    filters: tuple[FilterRule, ...]
    columns: tuple[OutputColumn, ...]

    @property
    def output_names(self) -> list[str]:
        return [c.name for c in self.columns]


def validate_delimiters(text: str, rule: str) -> None:
    """O(n) bracket-balance scan (reference ``main.gs:172-184``)."""
    count = 0
    for ch in text:
        if ch == "[":
            count += 1
        elif ch == "]":
            count -= 1
        if count < 0:
            raise UnbalancedDelimiterError(rule, "extra_close")
    if count != 0:
        raise UnbalancedDelimiterError(rule, "unclosed")


def _check_src_refs(instruction: str, rule: str, source_columns: Sequence[str]) -> None:
    """Every ``src[X]`` must name a source column (reference ``main.gs:211-219``)."""
    known = set(source_columns)
    for m in SRC_REF_RE.finditer(instruction):
        if m.group(1) not in known:
            raise MissingColumnError(m.group(1), rule)


def strip_quotes(s: str) -> str:
    """Strip one leading and one trailing double quote (reference
    ``main.gs:284``: ``replace(/^"|"$/g, "")`` — each end independently)."""
    if s.startswith('"'):
        s = s[1:]
    if s.endswith('"'):
        s = s[:-1]
    return s


def parse_condition(raw: str, rule: str) -> Comparison:
    """Parse one ``||``-branch of a filter expression.

    Mirrors the reference evaluator's *structure checks* at parse time
    (``main.gs:263-287``): invalid-operator runs raise; a missing operator
    or an operand split ≠ 2 yields a silently-false comparison.  Operand
    text keeps its surrounding quotes here — quote stripping is an
    evaluation-time concern handled by the compiler, matching the
    reference's ordering (split first, strip after, ``main.gs:284``).
    """
    trimmed = raw.strip(JS_STR_WHITESPACE)
    bad = _INVALID_OP_RE.search(trimmed)
    if bad:
        raise InvalidOperatorError(bad.group(0), rule)
    op = next((o for o in OPERATORS if o in trimmed), None)
    if op is None:
        return Comparison(raw=trimmed)
    parts = [p.strip(JS_STR_WHITESPACE) for p in trimmed.split(op)]
    if len(parts) != 2:
        return Comparison(raw=trimmed, op=op, malformed=True)
    return Comparison(raw=trimmed, op=op, left=parts[0], right=parts[1])


def parse_filter_expression(instruction: str, rule: str) -> tuple[Comparison, ...]:
    """Split on ``||`` into a disjunction (reference ``main.gs:261-263``)."""
    return tuple(parse_condition(c, rule) for c in instruction.split("||"))


# DSL v2 only: the v1 grammar deliberately excludes AND and parentheses
# (``docs/expression-language.md:170-176``); the reference roadmap's
# "Advanced expression parser" (``README.md:121``) names it without
# defining syntax, so v2 keeps the v1 split-then-classify idiom and adds
# the two constructs the exclusion list names: ``&&`` (r6) and ``( )``
# grouping (r6).
AND_OPERATOR = "&&"
# Same malformed-operator discipline as ``_INVALID_OP_RE``'s
# ``[=><!]{3,}`` guard: a run of 3+ ``&`` is ambiguous and fails loud.
_INVALID_AND_RE = re.compile(r"&{3,}")


@dataclass(frozen=True)
class BoolAnd:
    """Conjunction node of the v2 expression tree."""

    children: tuple["BoolNode", ...]


@dataclass(frozen=True)
class BoolOr:
    """Disjunction node of the v2 expression tree."""

    children: tuple["BoolNode", ...]


# Leaves are plain :class:`Comparison` objects, so operand semantics
# (parseFloat, JS trim, quote strip, silent-false) stay the v1 compiler's.
BoolNode = "Comparison | BoolAnd | BoolOr"

# Structural tokens of the v2 grammar.  The scan is BLIND — quotes do not
# protect ``||``/``&&``/parens, matching the reference's blind
# ``split("||")`` (``main.gs:261``).  The difference: a paren that was
# meant as operand text fails LOUD (adjacency/balance checks below)
# instead of silently misparsing.
_V2_TOKEN_RE = re.compile(r"\|\||&&|[()]")
_V2_TOKEN_NAME = {"||": "OR", "&&": "AND", "(": "LPAREN", ")": "RPAREN"}


def _tokenize_v2(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    for m in _V2_TOKEN_RE.finditer(text):
        chunk = text[pos:m.start()]
        if chunk.strip():
            tokens.append(("TEXT", chunk))
        tokens.append((_V2_TOKEN_NAME[m.group(0)], m.group(0)))
        pos = m.end()
    tail = text[pos:]
    if tail.strip():
        tokens.append(("TEXT", tail))
    return tokens


class _V2ExprParser:
    """Recursive descent over the token stream:

    ``expr := and ("||" and)* ; and := primary ("&&" primary)* ;
    primary := "(" expr ")" | condition-text``

    A missing primary (``a &&``, ``|| b``, ``()``) is an empty condition
    — the silently-false discipline (``main.gs:282``) composed over the
    grammar.  Structural mistakes (unbalanced parens, text butted against
    a group like ``a == (1)`` or ``(a) (b)``) raise
    :class:`ExpressionSyntaxError` — fail-loud, because unlike a
    silently-false condition these can never be a row-level data issue.
    """

    def __init__(self, tokens: list[tuple[str, str]], rule: str) -> None:
        self.tokens = tokens
        self.rule = rule
        self.pos = 0

    def peek(self) -> str | None:
        return self.tokens[self.pos][0] if self.pos < len(self.tokens) else None

    def _advance(self) -> tuple[str, str]:
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def parse_or(self) -> "BoolNode":
        children = [self.parse_and()]
        while self.peek() == "OR":
            self._advance()
            children.append(self.parse_and())
        return children[0] if len(children) == 1 else BoolOr(tuple(children))

    def parse_and(self) -> "BoolNode":
        children = [self.parse_primary()]
        while self.peek() == "AND":
            self._advance()
            children.append(self.parse_primary())
        return children[0] if len(children) == 1 else BoolAnd(tuple(children))

    def _check_adjacency(self) -> None:
        nxt = self.peek()
        if nxt in ("TEXT", "LPAREN"):
            raise ExpressionSyntaxError(
                "operand text and a parenthesized group must be joined by "
                "&& or ||",
                self.rule,
            )

    def parse_primary(self) -> "BoolNode":
        tok = self.peek()
        if tok == "LPAREN":
            self._advance()
            if self.peek() == "RPAREN":
                self._advance()
                node: BoolNode = parse_condition("", self.rule)  # () -> false
            else:
                node = self.parse_or()
                if self.peek() != "RPAREN":
                    raise ExpressionSyntaxError('unclosed "("', self.rule)
                self._advance()
            self._check_adjacency()
            return node
        if tok == "TEXT":
            _, text = self._advance()
            self._check_adjacency()
            return parse_condition(text, self.rule)
        # OR / AND / RPAREN / end-of-input with no operand in front:
        # the empty condition — silently false, group semantics intact.
        return parse_condition("", self.rule)


def parse_filter_expression_v2(instruction: str, rule: str) -> "BoolNode":
    """DSL v2 expression → boolean tree (leaves are :class:`Comparison`).

    ``&&`` binds tighter than ``||`` (JS precedence): ``a || b && c``
    means ``a || (b && c)``; parentheses override grouping
    (``(a || b) && c``).  A lone ``&`` is NOT an operator — it stays
    literal operand text exactly as v1 treats it; ``&&&``+ fails loud.
    An empty conjunct (``a &&``), empty branch (``|| a``) or empty group
    (``()``) parses to the operator-less silently-false comparison — the
    v1 silent-false discipline (``main.gs:282``) composed over the new
    levels.  Parens are structural tokens everywhere (the scan is blind,
    like the reference's ``split("||")``), so a paren inside an operand
    or quoted literal is a loud :class:`ExpressionSyntaxError`, never a
    silent misparse.  Without parens the tree is exactly the
    OR-of-AND-groups the pre-paren grammar produced.
    """
    bad = _INVALID_AND_RE.search(instruction)
    if bad:
        raise InvalidOperatorError(bad.group(0), rule)
    parser = _V2ExprParser(_tokenize_v2(instruction), rule)
    node = parser.parse_or()
    if parser.peek() is not None:       # only a stray ')' can remain
        raise ExpressionSyntaxError('extra closing ")"', rule)
    return node


def parse_mapping(
    rules: Iterable[tuple[str, str]],
    source_columns: Sequence[str],
    *,
    require_output: bool = True,
) -> MappingSpec:
    """Parse ``(name, instruction)`` pairs into a :class:`MappingSpec`.

    This is the engine-level entry point: the iterable carries *data* rules
    only (no sheet header row).  Use :func:`parse_map_table` for a raw
    sheet-shaped table.  Comment rows (name starting ``//``) and rows with
    blank names are dropped here too, so both entry points accept them.
    """
    filters: list[FilterRule] = []
    columns: list[OutputColumn] = []

    for raw_name, raw_instruction in rules:
        name = str(raw_name).strip() if raw_name is not None else ""
        if not name or name.startswith(COMMENT_PREFIX):
            continue
        instruction = str(raw_instruction).strip() if raw_instruction is not None else ""

        validate_delimiters(instruction, name)
        _check_src_refs(instruction, name, source_columns)

        if name.startswith(FILTER_PREFIX):
            is_eval = instruction.startswith(EVAL_PREFIX)
            # Match the reference's `.replace(PREFIX.EVAL, "")`: it removes
            # the *first* occurrence anywhere, but with startswith guaranteed
            # this is a prefix strip.
            body = instruction[len(EVAL_PREFIX):].strip() if is_eval else instruction
            conditions = parse_filter_expression(body, name) if is_eval else ()
            filters.append(
                FilterRule(name=name, is_eval=is_eval, instruction=body, conditions=conditions)
            )
        else:
            kind = ColumnKind.DIRECT
            body = instruction
            if instruction.startswith(CONSTANT_PREFIX):
                kind = ColumnKind.CONSTANT
                body = instruction[len(CONSTANT_PREFIX):].strip()
            elif instruction.startswith(FORMULA_PREFIX):
                kind = ColumnKind.FORMULA
                body = instruction[len(FORMULA_PREFIX):].strip()
            columns.append(OutputColumn(name=name, kind=kind, instruction=body))

    if require_output and not columns:
        raise NoOutputColumnsError()
    return MappingSpec(filters=tuple(filters), columns=tuple(columns))


def parse_map_table(
    table: Sequence[Sequence[object]],
    source_columns: Sequence[str],
    *,
    require_output: bool = True,
) -> MappingSpec:
    """Parse a raw sheet-shaped map table (row 0 = header, skipped;
    reference ``main.gs:186-193``)."""
    pairs = [
        (str(r[0]) if len(r) > 0 and r[0] is not None else "",
         str(r[1]) if len(r) > 1 and r[1] is not None else "")
        for r in list(table)[1:]
    ]
    return parse_mapping(pairs, source_columns, require_output=require_output)
