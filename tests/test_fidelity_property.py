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
