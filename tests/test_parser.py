"""DSL parser unit + property tests (SURVEY §5.2 item 1)."""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from spreadsheet_etl_engine_spark.config import load_config
from spreadsheet_etl_engine_spark.errors import (
    InvalidOperatorError,
    MissingColumnError,
    MissingConfigError,
    NoOutputColumnsError,
    UnbalancedDelimiterError,
)
from spreadsheet_etl_engine_spark.plans.parser import (
    ColumnKind,
    parse_condition,
    parse_map_table,
    parse_mapping,
    validate_delimiters,
)

HEADERS = ["Name", "Age", "Score", "City", "Amount", "Status"]


def test_classification_and_comments():
    spec = parse_mapping(
        [
            ("_filter:adult", "eval: src[Age] >= 18 || src[Status] == active"),
            ("_filter:note", "just a note"),
            ("// disabled", "src[Name]"),
            ("", "ignored blank name"),
            ("FullName", "src[Name]"),
            ("CityCopy", "City"),
            ("Label", "not_a_header"),
            ("Flag", "constant:Active"),
            ("Calc", "formula:=src[Amount]*2"),
        ],
        HEADERS,
    )
    assert [f.name for f in spec.filters] == ["_filter:adult", "_filter:note"]
    assert spec.filters[0].is_eval and not spec.filters[1].is_eval
    assert len(spec.filters[0].conditions) == 2
    assert spec.output_names == ["FullName", "CityCopy", "Label", "Flag", "Calc"]
    kinds = [c.kind for c in spec.columns]
    assert kinds == [
        ColumnKind.DIRECT,
        ColumnKind.DIRECT,
        ColumnKind.DIRECT,
        ColumnKind.CONSTANT,
        ColumnKind.FORMULA,
    ]
    assert spec.columns[3].instruction == "Active"
    assert spec.columns[4].instruction == "=src[Amount]*2"


def test_map_table_skips_header_row():
    spec = parse_map_table(
        [["rule", "instruction"], ["Out", "src[Name]"]],
        HEADERS,
    )
    assert spec.output_names == ["Out"]


def test_zero_output_columns_raises():
    with pytest.raises(NoOutputColumnsError):
        parse_mapping([("_filter:x", "eval: src[Age] > 1")], HEADERS)


def test_unknown_column_raises():
    with pytest.raises(MissingColumnError) as e:
        parse_mapping([("Out", "src[Nope]")], HEADERS)
    assert "Nope" in str(e.value)


def test_unbalanced_raises():
    with pytest.raises(UnbalancedDelimiterError):
        parse_mapping([("Out", "src[Age")], HEADERS)
    with pytest.raises(UnbalancedDelimiterError):
        parse_mapping([("Out", "src[Age]]")], HEADERS)


def test_invalid_operator_raises():
    with pytest.raises(InvalidOperatorError):
        parse_mapping(
            [("_filter:x", "eval: src[Age] === 5"), ("Out", "src[Name]")], HEADERS
        )
    with pytest.raises(InvalidOperatorError):
        parse_condition("a >> b", "r")


def test_operator_first_match_order():
    # `>=` must win over `>` (reference main.gs:273-280 fixed order).
    c = parse_condition("src[Age] >= 18", "r")
    assert c.op == ">=" and c.left == "src[Age]" and c.right == "18"
    # `==` is searched before `<`: "a<b==c" finds `==` first.
    c = parse_condition("a<b==c", "r")
    assert c.op == "=="


def test_silent_false_conditions():
    assert parse_condition("no operator here", "r").always_false
    # Operator appears twice → 3 parts → silently false (main.gs:287).
    assert parse_condition("a == b == c", "r").always_false


def test_non_eval_filter_has_no_conditions():
    spec = parse_mapping(
        [("_filter:x", "anything"), ("Out", "src[Name]")], HEADERS
    )
    assert spec.filters[0].conditions == ()


@given(st.text(alphabet="[]ab", max_size=30))
def test_delimiter_property(text):
    balance = 0
    valid = True
    for ch in text:
        if ch == "[":
            balance += 1
        elif ch == "]":
            balance -= 1
        if balance < 0:
            valid = False
            break
    valid = valid and balance == 0
    if valid:
        validate_delimiters(text, "r")
    else:
        with pytest.raises(UnbalancedDelimiterError):
            validate_delimiters(text, "r")


@given(
    st.sampled_from(["==", "!=", ">=", "<=", ">", "<"]),
    st.text(alphabet="abc 0123.", max_size=10),
    st.text(alphabet="abc 0123.", max_size=10),
)
def test_condition_roundtrip_property(op, left, right):
    raw = f"{left}{op}{right}"
    cond = parse_condition(raw, "r")
    # The detected operator is the first in fixed order appearing in raw.
    expected_op = next(o for o in ("==", "!=", ">=", "<=", ">", "<") if o in raw)
    assert cond.op == expected_op


def test_load_config_defaults_and_overrides():
    assert load_config(None).source == "Source"
    cfg = load_config([["SOURCE ", " people "], ["bogus", "x"], [None, "y"], ["output", "out"]])
    assert cfg.source == "people"
    assert cfg.map == "Map"
    assert cfg.output == "out"
    with pytest.raises(MissingConfigError):
        load_config({"source": "  "})


@given(st.text(max_size=40), st.text(max_size=60))
def test_parser_never_raises_foreign_exceptions(name, instruction):
    """Arbitrary rule text either parses or raises an EngineError —
    never an internal exception (the reference's design principle of
    contextualized errors, docs/expression-language.md:285-292)."""
    from spreadsheet_etl_engine_spark.errors import EngineError

    try:
        parse_mapping([(name, instruction), ("Out", "src[Name]")], HEADERS)
    except EngineError:
        pass
