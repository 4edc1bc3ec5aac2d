"""Property test: compiled fidelity-mode plans must match the row-at-a-time
reference semantics (tests/reference_impl.py) on arbitrary string tables and
rule sets.

Generation stays inside the documented grammar (no operator characters or
brackets inside literals — substitution-order pathologies are documented
deviations, SURVEY compiler notes)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spreadsheet_etl_engine_spark.plans.parser import parse_mapping
from spreadsheet_etl_engine_spark.plans.runner import run_mapping
from tests.reference_impl import run_mapping_reference

HEADERS = ["A", "B", "C"]
# Pool includes parseFloat landmines: "Inf" (NaN in JS, inf in Python
# float()), "Infinity" (valid in both), "nan"/"1_0" (Python-only), "1e"
# (prefix-parses to 1), "+5"/".5"/"3e2" (valid prefixes).
VALUES = ["17", "abc", "", "12%", "1.0", "1", '"active"', "active",
          "Cali", "-3.2", " pad ", "B", "0", "3e2", "+5", ".5", "1e",
          "Inf", "Infinity", "-Infinity", "nan", "1_0", "%5", "a b",
          " 5", '"5"', '" 7"', " -2.5 ", "\u00a05", "\u20285", "\ufeff5"]
LITERALS = ["17", "abc", "", "12%", "1.0", "1", '"active"', "active",
            "Cali", "-3.2", "0", "B", "Inf", "Infinity", "1e", ".5",
            " 5", '"5"']
OPS = ["==", "!=", ">=", "<=", ">", "<"]

operand = st.one_of(
    st.sampled_from([f"src[{h}]" for h in HEADERS]),
    st.sampled_from(LITERALS),
)
condition = st.builds(lambda l, op, r: f"{l} {op} {r}", operand, st.sampled_from(OPS), operand)
filter_expr = st.lists(condition, min_size=1, max_size=3).map(" || ".join)

direct_instruction = st.sampled_from(
    [f"src[{h}]" for h in HEADERS] + HEADERS
    + ["not_a_header", "x src[A] y",
       # constants, including ref-splicing ones (main.gs:85-97 runs the
       # substitution pass for every column type)
       "constant:fixed", "constant:id-src[B]", "constant:src[A] src[C]"]
)

rows = st.lists(
    st.tuples(*[st.sampled_from(VALUES) for _ in HEADERS]).map(list),
    min_size=0,
    max_size=8,
)


@settings(max_examples=24, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(data=rows, fexprs=st.lists(filter_expr, min_size=0, max_size=2),
       directs=st.lists(direct_instruction, min_size=1, max_size=3))
def test_fidelity_matches_reference(spark, data, fexprs, directs):
    rules = [(f"_filter:f{i}", f"eval: {e}") for i, e in enumerate(fexprs)]
    rules += [(f"Out{i}", ins) for i, ins in enumerate(directs)]

    exp_headers, exp_rows = run_mapping_reference(HEADERS, data, rules)

    if data:
        df = spark.createDataFrame([tuple(r) for r in data], HEADERS)
    else:
        df = spark.createDataFrame([], "A string, B string, C string")
    got = run_mapping(df, parse_mapping(rules, HEADERS), mode="fidelity")
    assert got.columns == exp_headers
    got_rows = sorted([list(r) for r in got.collect()])
    assert got_rows == sorted(exp_rows)


# --- Full map tables: filters + DIRECT + CONSTANT + FORMULA columns +
# self-chains + comment rows in ONE generated spec (r9 verdict item 6 —
# the mechanical version of the oracle-blind review for the DSL surface).
#
# FORMULA columns draw from a restricted template family that is TOTAL on
# display strings (UPPER/LOWER/&-concat/LEFT/LEN/IF-string-equality and a
# self[...]-chain suffix) so the generator never wanders into ANSI
# numeric casts of non-numeric text (those fail loud by design and are
# pinned by dedicated unit tests).  Each template carries its own Python
# evaluator, handed to the model via ``formula_eval`` — so the model
# stays an independent row-at-a-time implementation of the ENGINE's
# documented compiled-value semantics (value-level self refs, codepoint
# substring/length), not a re-parse of the engine's compiler.

_FORMULA_TEMPLATES = [
    # (tag, instruction-builder, python evaluator(row, out, *ops))
    ("upper", lambda a: f"formula:=UPPER({a})",
     lambda va: va.upper()),
    ("lower", lambda a: f"formula:=LOWER({a})",
     lambda va: va.lower()),
    ("concat", lambda a, b: f"formula:={a} & {b}",
     lambda va, vb: va + vb),
    ("left2", lambda a: f"formula:=LEFT({a}, 2)",
     lambda va: va[:2]),
    ("len", lambda a: f"formula:=LEN({a})",
     lambda va: len(va)),
    ("ifeq", lambda a, b: f'formula:=IF({a} = {b}, "eq", "ne")',
     lambda va, vb: "eq" if va == vb else "ne"),
]

_FORMULA_ARITY = {"upper": 1, "lower": 1, "concat": 2, "left2": 1,
                  "len": 1, "ifeq": 2}

# Operands: a source column or a plain string literal (formula grammar
# quotes literals; letters only so no escaping interactions).
_F_LITERALS = ["qq", "eq", "B", "pad"]


@st.composite
def map_table_specs(draw):
    """One whole mapping spec: comment rows interleaved with filters,
    DIRECT/CONSTANT columns, then FORMULA columns that may self-chain
    onto ANY earlier output column (including earlier formulas)."""
    rules: list[tuple[str, str]] = []
    evals: dict[str, object] = {}   # out-name -> (tag, operand descriptors)

    n_comments = draw(st.integers(0, 2))
    for i in range(n_comments):
        rules.append((f"// note {i}", draw(st.sampled_from(["", "x", "src[A]"]))))

    for i, e in enumerate(draw(st.lists(filter_expr, min_size=0, max_size=2))):
        rules.append((f"_filter:f{i}", f"eval: {e}"))

    base_cols = draw(st.lists(direct_instruction, min_size=1, max_size=2))
    out_names: list[str] = []
    for i, ins in enumerate(base_cols):
        name = f"Out{i}"
        rules.append((name, ins))
        out_names.append(name)

    n_formula = draw(st.integers(1, 3))
    for j in range(n_formula):
        tag, build, _fn = draw(st.sampled_from(_FORMULA_TEMPLATES))
        arity = _FORMULA_ARITY[tag]
        ops = []
        for _ in range(arity):
            # ifeq compares with `=`: an int-valued self[...] (LEN) on
            # one side would make Spark coerce the STRING side to a
            # number — an ANSI runtime error on non-numeric text (the
            # engine's documented fail-loud), so equality operands stay
            # src/lit.  Every other template casts to string explicitly.
            kinds = ["src", "lit"] if tag == "ifeq" else ["src", "lit", "self"]
            kind = draw(st.sampled_from(kinds))
            if kind == "src":
                ops.append(("src", draw(st.sampled_from(HEADERS))))
            elif kind == "lit":
                ops.append(("lit", draw(st.sampled_from(_F_LITERALS))))
            else:
                ops.append(("self", draw(st.sampled_from(out_names))))
        texts = [
            f"src[{v}]" if k == "src"
            else (f'"{v}"' if k == "lit" else f"self[{v}]")
            for k, v in ops
        ]
        name = f"Out{len(out_names)}"
        rules.append((name, build(*texts)))
        evals[name] = (tag, ops)
        out_names.append(name)
    return rules, evals


def _model_formula_eval(evals):
    def formula_eval(body, row_map, out_map):
        # Identify the column by matching the body against the recorded
        # template of the output being produced: out_map holds exactly
        # the columns already produced, so the one being evaluated is
        # the first registered name not yet in out_map.
        name = next(n for n in evals if n not in out_map)
        tag, ops = evals[name]
        fn = next(f for t, _, f in _FORMULA_TEMPLATES if t == tag)

        def val(op):
            k, v = op
            if k == "src":
                return row_map[v]
            if k == "lit":
                return v
            out_v = out_map[v]
            # self[...] into a & / UPPER context: the engine casts the
            # referenced expression to string, so an int (LEN output)
            # chains as its decimal text.
            return str(out_v) if not isinstance(out_v, str) else out_v

        return fn(*[val(op) for op in ops])
    return formula_eval


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(data=rows, spec=map_table_specs())
def test_full_map_table_matches_reference(spark, data, spec):
    rules, evals = spec
    exp_headers, exp_rows = run_mapping_reference(
        HEADERS, data, rules, formula_eval=_model_formula_eval(evals))

    if data:
        df = spark.createDataFrame([tuple(r) for r in data], HEADERS)
    else:
        df = spark.createDataFrame([], "A string, B string, C string")
    got = run_mapping(df, parse_mapping(rules, HEADERS), mode="fidelity")
    assert got.columns == exp_headers
    got_rows = sorted([list(r) for r in got.collect()])
    assert got_rows == sorted(exp_rows)


# --- A1-reference map tables: formulas that reference OTHER output
# columns by A1 ordinal (letter = 1-based output position, row 2 = the
# current-row placeholder), including FORWARD references resolved by the
# compiler's multi-pass topological compile.  Generation is acyclic by
# construction: declaration order is [base DIRECT/CONSTANT] then
# [reffing formulas] then [grounded formulas (src/lit operands only)];
# a reffing formula may point backward at a base column or FORWARD at a
# grounded formula, which can always be evaluated from the row alone.

_STR_TOTAL_TAGS = ["upper", "lower", "concat", "left2", "len"]


def _a1_letter(ordinal: int) -> str:
    assert 1 <= ordinal <= 26
    return chr(64 + ordinal)


@st.composite
def a1_map_specs(draw):
    rules: list[tuple[str, str]] = []
    for i, e in enumerate(draw(st.lists(filter_expr, min_size=0, max_size=1))):
        rules.append((f"_filter:f{i}", f"eval: {e}"))

    base_cols = draw(st.lists(direct_instruction, min_size=1, max_size=2))
    names: list[str] = []
    for i, ins in enumerate(base_cols):
        rules.append((f"Out{i}", ins))
        names.append(f"Out{i}")
    n_base = len(names)
    n_reffing = draw(st.integers(1, 2))
    n_grounded = draw(st.integers(1, 2))
    grounded_names = [f"Out{n_base + n_reffing + j}" for j in range(n_grounded)]
    # final output order = base + reffing + grounded; ordinal = pos + 1
    all_names = (names
                 + [f"Out{n_base + j}" for j in range(n_reffing)]
                 + grounded_names)
    ordinal = {n: i + 1 for i, n in enumerate(all_names)}

    evals: dict[str, object] = {}
    grounded_specs: dict[str, object] = {}

    def draw_ops(tag, kinds):
        ops = []
        for _ in range(_FORMULA_ARITY[tag]):
            kind = draw(st.sampled_from(kinds))
            if kind == "src":
                ops.append(("src", draw(st.sampled_from(HEADERS))))
            elif kind == "lit":
                ops.append(("lit", draw(st.sampled_from(_F_LITERALS))))
            else:
                ops.append(("a1", draw(st.sampled_from(names + grounded_names))))
        return ops

    reff_rules: list[tuple[str, str]] = []
    for j in range(n_reffing):
        name = f"Out{n_base + j}"
        tag = draw(st.sampled_from(_STR_TOTAL_TAGS))
        ops = draw_ops(tag, ["src", "lit", "a1"])
        texts = [
            f"src[{v}]" if k == "src"
            else (f'"{v}"' if k == "lit" else f"{_a1_letter(ordinal[v])}2")
            for k, v in ops
        ]
        build = next(b for t, b, _ in _FORMULA_TEMPLATES if t == tag)
        reff_rules.append((name, build(*texts)))
        evals[name] = (tag, ops)
    grounded_rules: list[tuple[str, str]] = []
    for gname in grounded_names:
        tag = draw(st.sampled_from(_STR_TOTAL_TAGS))
        ops = draw_ops(tag, ["src", "lit"])
        texts = [f"src[{v}]" if k == "src" else f'"{v}"' for k, v in ops]
        build = next(b for t, b, _ in _FORMULA_TEMPLATES if t == tag)
        grounded_rules.append((gname, build(*texts)))
        evals[gname] = (tag, ops)
        grounded_specs[gname] = (tag, ops)
    rules += reff_rules + grounded_rules
    return rules, evals, grounded_specs


def _model_a1_eval(evals, grounded_specs):
    fns = {t: f for t, _, f in _FORMULA_TEMPLATES}

    def compute(tag, ops, row_map, out_map):
        def val(op):
            k, v = op
            if k == "src":
                return row_map[v]
            if k == "lit":
                return v
            if v in out_map:                     # backward ref
                out_v = out_map[v]
            else:                                # forward ref: grounded
                gt, gops = grounded_specs[v]
                out_v = compute(gt, gops, row_map, out_map)
            return str(out_v) if not isinstance(out_v, str) else out_v
        return fns[tag](*[val(op) for op in ops])

    def formula_eval(body, row_map, out_map):
        name = next(n for n in evals if n not in out_map)
        tag, ops = evals[name]
        return compute(tag, ops, row_map, out_map)
    return formula_eval


@settings(max_examples=24, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(data=rows, spec=a1_map_specs())
def test_a1_reference_map_table_matches_reference(spark, data, spec):
    rules, evals, grounded_specs = spec
    exp_headers, exp_rows = run_mapping_reference(
        HEADERS, data, rules, formula_eval=_model_a1_eval(evals, grounded_specs))

    if data:
        df = spark.createDataFrame([tuple(r) for r in data], HEADERS)
    else:
        df = spark.createDataFrame([], "A string, B string, C string")
    got = run_mapping(df, parse_mapping(rules, HEADERS), mode="fidelity")
    assert got.columns == exp_headers
    got_rows = sorted([list(r) for r in got.collect()])
    assert got_rows == sorted(exp_rows)


# v2 grammar: conditions joined by a random mix of && and ||.  The model
# applies JS precedence (&& binds tighter), so any compiled divergence in
# grouping, short-circuit equivalence, or empty-conjunct handling breaks
# the comparison.
v2_expr = st.lists(condition, min_size=1, max_size=4).flatmap(
    lambda conds: st.lists(
        st.sampled_from([" || ", " && "]),
        min_size=len(conds) - 1, max_size=len(conds) - 1,
    ).map(lambda seps: "".join(
        c + s for c, s in zip(conds, seps + [""])
    ))
)


@settings(max_examples=24, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(data=rows, fexprs=st.lists(v2_expr, min_size=1, max_size=2),
       directs=st.lists(direct_instruction, min_size=1, max_size=3))
def test_v2_and_grammar_matches_reference(spark, data, fexprs, directs):
    from spreadsheet_etl_engine_spark.plans.extensions import run_mapping_v2
    from tests.reference_impl import safe_eval_v2

    rules = [(f"_filter:f{i}", f"eval: {e}") for i, e in enumerate(fexprs)]
    rules += [(f"Out{i}", ins) for i, ins in enumerate(directs)]

    exp_headers, exp_rows = run_mapping_reference(
        HEADERS, data, rules, evaluator=safe_eval_v2)

    if data:
        df = spark.createDataFrame([tuple(r) for r in data], HEADERS)
    else:
        df = spark.createDataFrame([], "A string, B string, C string")
    got = run_mapping_v2({"src": df}, rules, mode="fidelity")
    assert got.columns == exp_headers
    got_rows = sorted([list(r) for r in got.collect()])
    assert got_rows == sorted(exp_rows)


# v2 grammar with parens: arbitrarily nested (expr) groups mixed with
# &&/|| joins.  The model evaluator implements the same recursive-descent
# grammar independently (tests/reference_impl.py::safe_eval_v2), so a
# compiled divergence in grouping, paren scoping, or empty-group
# handling breaks the comparison.
v2_paren_expr = st.recursive(
    condition,
    lambda sub: st.one_of(
        sub.map(lambda e: f"({e})"),
        st.builds(
            lambda a, sep, b: f"{a}{sep}{b}",
            sub, st.sampled_from([" || ", " && "]), sub,
        ),
    ),
    max_leaves=6,
)


@settings(max_examples=24, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(data=rows, fexprs=st.lists(v2_paren_expr, min_size=1, max_size=2),
       directs=st.lists(direct_instruction, min_size=1, max_size=2))
def test_v2_paren_grammar_matches_reference(spark, data, fexprs, directs):
    from spreadsheet_etl_engine_spark.plans.extensions import run_mapping_v2
    from tests.reference_impl import safe_eval_v2

    rules = [(f"_filter:f{i}", f"eval: {e}") for i, e in enumerate(fexprs)]
    rules += [(f"Out{i}", ins) for i, ins in enumerate(directs)]

    exp_headers, exp_rows = run_mapping_reference(
        HEADERS, data, rules, evaluator=safe_eval_v2)

    if data:
        df = spark.createDataFrame([tuple(r) for r in data], HEADERS)
    else:
        df = spark.createDataFrame([], "A string, B string, C string")
    got = run_mapping_v2({"src": df}, rules, mode="fidelity")
    assert got.columns == exp_headers
    got_rows = sorted([list(r) for r in got.collect()])
    assert got_rows == sorted(exp_rows)
