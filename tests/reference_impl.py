"""Pure-Python reimplementation of the reference interpreter, used ONLY as a
test oracle for fidelity-mode semantics.

Reimplemented from the documented behavior of
``/root/reference/main.gs:67-119,251-289`` (per-row substitution, AND of
filter rules, OR of conditions, loose equality, parseFloat ordering, silent
false, quote stripping, DIRECT header indirection, formula splicing).  This
lets property tests compare the compiled Spark plan against the row-at-a-time
semantics on arbitrary string tables without a JS runtime.
"""

from __future__ import annotations

import math
import re

OPERATORS = ("==", "!=", ">=", "<=", ">", "<")
_INVALID_OP_RE = re.compile(r"[=><!]{3,}|[><]{2,}")
_PARSEFLOAT_RE = re.compile(r"^[+-]?(Infinity|(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?)")


# ECMA-262 StrWhiteSpace: ASCII whitespace plus NBSP, Ogham, the U+2000
# block, LS/PS, NNBSP, MMSP, ideographic space, and the BOM (which
# Python's default str.strip() does NOT strip).  FS/GS/RS/US and NEL are
# in Python's strip set but NOT in ECMA-262 \u2014 real JS trim()/parseFloat
# keeps them, so this set excludes them deliberately.  Mirrors the
# compiled class in plans/compiler.py::parse_float_col.
_STR_WHITESPACE = (
    " \t\n\r\v\f\u00a0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000\ufeff"
)


def parse_float(s: str) -> float:
    m = _PARSEFLOAT_RE.match(s.strip(_STR_WHITESPACE))
    if not m:
        return math.nan
    text = m.group(0)
    if "Infinity" in text:
        return -math.inf if text.startswith("-") else math.inf
    return float(text)


def strip_quotes(s: str) -> str:
    if s.startswith('"'):
        s = s[1:]
    if s.endswith('"'):
        s = s[:-1]
    return s


_OPS_TABLE = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">=": lambda a, b: parse_float(a) >= parse_float(b),
    "<=": lambda a, b: parse_float(a) <= parse_float(b),
    ">": lambda a, b: parse_float(a) > parse_float(b),
    "<": lambda a, b: parse_float(a) < parse_float(b),
}


def eval_condition(cond: str, rule: str = "Filtro") -> bool:
    """One binary comparison: operator detection in fixed order, JS-trim
    + quote-strip each operand, silent false on missing/malformed."""
    trimmed = cond.strip(_STR_WHITESPACE)
    bad = _INVALID_OP_RE.search(trimmed)
    if bad:
        raise ValueError(f'Invalid operator "{bad.group(0)}" in "{rule}".')
    op = next((o for o in OPERATORS if o in trimmed), None)
    if op is None:
        return False
    # JS String.trim() semantics (the reference trims each operand,
    # main.gs:284): strip the full ECMA-262 whitespace set, which is
    # wider than Python's default (BOM) — mirror of the compiled
    # js_trim_col.
    parts = [strip_quotes(p.strip(_STR_WHITESPACE)) for p in trimmed.split(op)]
    if len(parts) != 2:
        return False
    return _OPS_TABLE[op](parts[0], parts[1])


def safe_eval(expression: str, rule: str = "Filtro") -> bool:
    """Evaluate a fully substituted v1 filter expression (OR only)."""
    for cond in expression.split("||"):
        if eval_condition(cond, rule):
            return True
    return False


_INVALID_AND_RE = re.compile(r"&{3,}")
_V2_TOKEN_RE = re.compile(r"\|\||&&|[()]")


def _tokenize_v2(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    names = {"||": "OR", "&&": "AND", "(": "LPAREN", ")": "RPAREN"}
    pos = 0
    for m in _V2_TOKEN_RE.finditer(text):
        chunk = text[pos:m.start()]
        if chunk.strip():
            tokens.append(("TEXT", chunk))
        tokens.append((names[m.group(0)], m.group(0)))
        pos = m.end()
    if text[pos:].strip():
        tokens.append(("TEXT", text[pos:]))
    return tokens


def safe_eval_v2(expression: str, rule: str = "Filtro") -> bool:
    """DSL v2 expression: ``||`` over ``&&``-conjunctions (``&&`` binds
    tighter), parens override grouping — independent row-at-a-time mirror
    of plans/parser.py::parse_filter_expression_v2 + the recursive
    compile, sharing only the v1 ``eval_condition`` leaf."""
    bad = _INVALID_AND_RE.search(expression)
    if bad:
        raise ValueError(f'Invalid operator "{bad.group(0)}" in "{rule}".')
    tokens = _tokenize_v2(expression)
    pos = 0

    def peek() -> str | None:
        return tokens[pos][0] if pos < len(tokens) else None

    def check_adjacency() -> None:
        if peek() in ("TEXT", "LPAREN"):
            raise ValueError(f'Invalid expression in rule "{rule}": adjacency')

    def parse_primary() -> bool:
        nonlocal pos
        if peek() == "LPAREN":
            pos += 1
            if peek() == "RPAREN":
                pos += 1
                value = eval_condition("", rule)    # () -> silently false
            else:
                value = parse_or()
                if peek() != "RPAREN":
                    raise ValueError(f'Invalid expression in rule "{rule}": unclosed (')
                pos += 1
            check_adjacency()
            return value
        if peek() == "TEXT":
            text = tokens[pos][1]
            pos += 1
            check_adjacency()
            return eval_condition(text, rule)
        return eval_condition("", rule)             # missing operand

    def parse_and() -> bool:
        value = parse_primary()
        while peek() == "AND":
            nonlocal_pos_advance()
            value = parse_primary() and value       # no short-circuit: every
        return value                                # operand must still parse

    def parse_or() -> bool:
        value = parse_and()
        while peek() == "OR":
            nonlocal_pos_advance()
            value = parse_and() or value
        return value

    def nonlocal_pos_advance() -> None:
        nonlocal pos
        pos += 1

    result = parse_or()
    if pos < len(tokens):
        raise ValueError(f'Invalid expression in rule "{rule}": extra )')
    return result


def substitute_src(text: str, headers: list[str], row: list[str]) -> str:
    for h, v in zip(headers, row):
        text = text.replace(f"src[{h}]", v)
    return text


def run_mapping_reference(
    headers: list[str],
    rows: list[list[str]],
    rules: list[tuple[str, str]],
    *,
    evaluator=safe_eval,
    formula_eval=None,
) -> tuple[list[str], list[list[str]]]:
    """Row-at-a-time reference semantics over an all-string table.

    DIRECT/CONSTANT output columns and eval filters are modeled directly.
    FORMULA columns default to the reference's pass-through behavior
    (substituted text — the formula lands in the sheet unevaluated); pass
    ``formula_eval(body, row_map, out_map) -> value`` to model the
    engine's COMPILED value semantics instead (``row_map`` maps source
    headers to this row's values, ``out_map`` maps the already-produced
    output columns of THIS row to their values — the ``self[...]`` chain
    state).  Pass ``evaluator=safe_eval_v2`` to model the DSL v2
    expression grammar (``&&`` enabled).
    Returns (output_headers, output_rows).
    """
    filters: list[tuple[str, bool, str]] = []
    columns: list[tuple[str, str, str]] = []
    for name, instruction in rules:
        name = name.strip()
        instruction = instruction.strip()
        if not name or name.startswith("//"):
            continue
        if name.startswith("_filter:"):
            is_eval = instruction.startswith("eval:")
            body = instruction[len("eval:"):].strip() if is_eval else instruction
            filters.append((name, is_eval, body))
        elif instruction.startswith("constant:"):
            columns.append((name, "CONSTANT", instruction[len("constant:"):].strip()))
        elif instruction.startswith("formula:"):
            columns.append((name, "FORMULA", instruction[len("formula:"):].strip()))
        else:
            columns.append((name, "DIRECT", instruction))

    header_index = {h: i for i, h in enumerate(headers)}
    out_rows: list[list[str]] = []
    for row in rows:
        passes = True
        for name, is_eval, body in filters:
            if not is_eval:
                continue
            if not evaluator(substitute_src(body, headers, row), name):
                passes = False
                break
        if not passes:
            continue
        out_row: list = []
        for name, kind, instruction in columns:
            if kind == "FORMULA" and formula_eval is not None:
                out_map = {
                    c[0]: v for c, v in zip(columns, out_row)
                }
                out_row.append(
                    formula_eval(instruction, dict(zip(headers, row)), out_map)
                )
                continue
            val = substitute_src(instruction, headers, row)
            if kind in ("CONSTANT", "FORMULA"):
                out_row.append(val)
            else:
                idx = header_index.get(val)
                out_row.append(row[idx] if idx is not None else val)
        out_rows.append(out_row)
    return [c[0] for c in columns], out_rows
