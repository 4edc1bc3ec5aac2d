"""Fidelity-mode semantics pinned against a row-at-a-time oracle
(SURVEY §5.2 item 2 — every row of the §2.3 cheat-sheet)."""

from __future__ import annotations

import pytest

from spreadsheet_etl_engine_spark.plans.parser import parse_mapping
from spreadsheet_etl_engine_spark.plans.runner import run_mapping
from tests.reference_impl import run_mapping_reference, safe_eval

HEADERS = ["Name", "Age", "Score", "City", "Amount", "Status"]
ROWS = [
    ["Ana", "17", "85%", "Cali", "1.0", "active"],
    ["Bob Pérez", "30", "7.5", "Bogotá", "1", '"active"'],
    ["", "abc", "0", "NY", "-3.2", "inactive"],
    ["Dot", "", "12%", "Cali", "0", "active"],
    ["Eve", "45", "100", "NY", "1.0", ""],
    ["City", "18", "5", "Name", "2", "active"],  # header-named values (indirection)
]


def _run_both(spark, rules):
    df = spark.createDataFrame([tuple(r) for r in ROWS], HEADERS)
    got = run_mapping(df, parse_mapping(rules, HEADERS), mode="fidelity")
    exp_headers, exp_rows = run_mapping_reference(HEADERS, ROWS, rules)
    assert got.columns == exp_headers
    got_rows = [[x for x in r] for r in got.collect()]
    assert got_rows == exp_rows, f"expected {exp_rows}, got {got_rows}"


def test_flagship_filter_and_project(spark):
    _run_both(
        spark,
        [
            ("_filter:adult", "eval: src[Age] >= 18 || src[Status] == active"),
            ("_filter:note", "just a note"),
            ("// disabled", "src[Name]"),
            ("FullName", "src[Name]"),
            ("CityCopy", "City"),
            ("Label", "not_a_header"),
            ("Flag", "constant:Active"),
        ],
    )


def test_loose_equality_is_string_equality(spark):
    # "1.0" == "1" must be FALSE in fidelity mode (main.gs:253 loose eq on strings).
    _run_both(spark, [("_filter:a", "eval: src[Amount] == 1"), ("N", "src[Name]")])


def test_parsefloat_ordering(spark):
    # "1.0" >= "1" is TRUE; "abc" > 0 is false (NaN); "12%" >= 12 is TRUE
    # (parseFloat prefix parse); "" is NaN.
    _run_both(spark, [("_filter:a", "eval: src[Amount] >= 1"), ("N", "src[Name]")])
    _run_both(spark, [("_filter:a", "eval: src[Age] > 0"), ("N", "src[Name]")])
    _run_both(spark, [("_filter:a", "eval: src[Score] >= 12"), ("N", "src[Name]")])
    _run_both(spark, [("_filter:a", "eval: src[Score] <= 50"), ("N", "src[Name]")])


def test_parsefloat_sees_trimmed_quote_stripped_operand(spark):
    """Numeric comparators run AFTER the trim + one-pair quote strip
    (main.gs:284) and JS parseFloat itself skips leading whitespace — a
    cell holding ' 5' or '"5"' satisfies src[X] >= 3."""
    headers = ["V", "Tag"]
    rows = [[" 5", "pad"], ['"5"', "quoted"], ['" 7"', "both"],
            ["abc", "nan"], ["  -2.5", "neg"], ["5", "plain"],
            [" 5", "nbsp"]]  # JS parseFloat skips Unicode whitespace
    df = spark.createDataFrame([tuple(r) for r in rows], headers)
    rules = [("_filter:n", "eval: src[V] >= 3"), ("Tag", "src[Tag]")]
    got = [r["Tag"] for r in run_mapping(df, parse_mapping(rules, headers),
                                         mode="fidelity").collect()]
    exp_headers, exp_rows = run_mapping_reference(headers, rows, rules)
    assert got == [r[0] for r in exp_rows] == ["pad", "quoted", "both", "plain", "nbsp"]


def test_constant_splices_src_refs(spark):
    """The substitution pass runs for CONSTANT columns too (main.gs:85-97):
    src[...] inside a constant emits the row value, unquoted."""
    headers = ["Name", "Age"]
    rows = [["Ana", "17"], ["Bob", "x y"]]
    df = spark.createDataFrame([tuple(r) for r in rows], headers)
    rules = [("Label", "constant:user-src[Name] (src[Age])"),
             ("Fixed", "constant:plain")]
    got = [list(r) for r in run_mapping(df, parse_mapping(rules, headers),
                                        mode="fidelity").collect()]
    exp_headers, exp_rows = run_mapping_reference(headers, rows, rules)
    assert got == exp_rows == [["user-Ana (17)", "plain"], ["user-Bob (x y)", "plain"]]


def test_quote_stripping(spark):
    # '"active"' cell: quotes are NOT stripped from cell values (stripping
    # applies to the substituted operand text, which here IS the cell value
    # post-substitution — so they are stripped).
    _run_both(spark, [("_filter:a", 'eval: src[Status] == "active"'), ("N", "src[Name]")])
    _run_both(spark, [("_filter:a", "eval: src[Status] != active"), ("N", "src[Name]")])


def test_or_of_conditions_and_of_rules(spark):
    _run_both(
        spark,
        [
            ("_filter:a", "eval: src[City] == Cali || src[City] == NY"),
            ("_filter:b", "eval: src[Age] >= 18"),
            ("N", "src[Name]"),
        ],
    )


def test_silent_false_condition(spark):
    _run_both(
        spark,
        [
            ("_filter:a", "eval: no operator || src[City] == Cali"),
            ("N", "src[Name]"),
        ],
    )


def test_direct_header_indirection(spark):
    # Row 6 has Name="City": `src[Name]` substitutes to "City" which IS a
    # header → reference emits the City value ("Name" header cell trick).
    _run_both(spark, [("Out", "src[Name]"), ("N2", "src[City]")])


def test_direct_mixed_text(spark):
    _run_both(spark, [("Out", "hello src[Name]!")])


def test_empty_result_preserves_schema(spark):
    _run_both(spark, [("_filter:a", "eval: src[City] == Nowhere"), ("N", "src[Name]")])


def test_safe_eval_oracle_selftest():
    assert safe_eval("1.0 >= 1")
    assert not safe_eval("1.0 == 1")
    assert safe_eval('"x" == x')
    assert not safe_eval("abc > 0")
    assert safe_eval("12% >= 12")
    assert not safe_eval("a == b == c || nothing")
    with pytest.raises(ValueError):
        safe_eval("a === b")


def test_a1_binds_to_output_declaration_positions(spark):
    """A1 letters address OUTPUT columns by declaration position
    (reference main.gs:107-108: the formula text lands in the output
    sheet) — NOT source ingest ordinals.  Output order here inverts the
    source order so the two bindings give different answers."""
    df = spark.createDataFrame([(2.0, 30.0)], ["x", "y"])  # source: A=x, B=y
    spec = parse_mapping(
        [
            ("Y", "src[y]"),          # output A
            ("X", "src[x]"),          # output B
            ("T", "formula:=A2-B2"),  # output binding: y-x = 28
        ],
        df.columns,
    )
    assert run_mapping(df, spec).collect()[0]["T"] == 28.0  # source binding would give -28


def test_a1_forward_reference_resolves(spark):
    """The reference's formula text is evaluated by the spreadsheet
    against the FULL output grid (main.gs:107-108), so =B2 from column A
    resolves even though B is declared later.  The compiled path
    reproduces that with a topological multi-pass compile."""
    df = spark.createDataFrame([(3.0,)], ["x"])
    spec = parse_mapping(
        [("T", "formula:=B2+1"), ("X", "formula:=src[x]*10")],
        df.columns,
    )
    row = run_mapping(df, spec).collect()[0]
    assert row["X"] == 30.0
    assert row["T"] == 31.0  # forward A1 chain: T = X + 1


def test_a1_forward_chain_through_backward_self(spark):
    """A deferred column (forward A1) can itself be the target of a
    backward self[...] from a later rule — the later rule waits for it."""
    df = spark.createDataFrame([(2.0,)], ["x"])
    spec = parse_mapping(
        [
            ("A", "formula:=C2*2"),      # forward: waits for C
            ("B", "formula:=self[A]+1"),  # backward self of a deferred col
            ("C", "formula:=src[x]+3"),
        ],
        df.columns,
    )
    row = run_mapping(df, spec).collect()[0]
    assert (row["A"], row["B"], row["C"]) == (10.0, 11.0, 5.0)


def test_a1_circular_reference_rejected(spark):
    """Cycles — what the spreadsheet flags as circular references — fail
    loud with the rules involved, both self-position and mutual."""
    from spreadsheet_etl_engine_spark.errors import CircularSelfRefError

    df = spark.createDataFrame([(1.0,)], ["x"])
    with pytest.raises(CircularSelfRefError, match="T"):
        run_mapping(df, parse_mapping([("T", "formula:=A2+1")], df.columns))
    spec = parse_mapping(
        [("P", "formula:=B2+1"), ("Q", "formula:=A2+1")],
        df.columns,
    )
    with pytest.raises(CircularSelfRefError, match='"P", "Q"'):
        run_mapping(df, spec)


def test_a1_out_of_range_rejected(spark):
    """An A1 letter past the declared output width can never resolve."""
    from spreadsheet_etl_engine_spark.errors import UnknownSelfRefError

    df = spark.createDataFrame([(1.0,)], ["x"])
    spec = parse_mapping([("T", "formula:=D2+1")], df.columns)
    with pytest.raises(UnknownSelfRefError, match="declaration position"):
        run_mapping(df, spec)


def test_self_forward_reference_still_rejected(spark):
    """self[...] (unlike A1) follows the reference's substitution pass,
    which only sees already-produced columns (main.gs:99-114): a forward
    self[...] there survives as literal text the spreadsheet cannot
    evaluate, so the compiled path keeps it fail-loud."""
    from spreadsheet_etl_engine_spark.errors import UnknownSelfRefError

    df = spark.createDataFrame([(1.0,)], ["x"])
    spec = parse_mapping(
        [("T", "formula:=self[Later]+1"), ("Later", "src[x]")],
        df.columns,
    )
    with pytest.raises(UnknownSelfRefError):
        run_mapping(df, spec)


def test_parsefloat_skips_bom(spark):
    """ECMA-262 StrWhiteSpace includes the BOM (U+FEFF) — it lands at
    cell start when a UTF-8-with-BOM file is pasted into a sheet, and JS
    parseFloat skips it.  Compiled column and oracle model must agree."""
    import math

    from pyspark.sql import functions as F

    from spreadsheet_etl_engine_spark.plans.compiler import parse_float_col
    from tests.reference_impl import parse_float

    cases = ["﻿5", " ﻿ 7.5x", "﻿abc", "﻿"]
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    got = [r["v"] for r in df.select(parse_float_col(F.col("s")).alias("v")).collect()]
    assert got == [5.0, 7.5, None, None]
    model = [parse_float(c) for c in cases]
    assert model[0] == 5.0 and model[1] == 7.5
    assert math.isnan(model[2]) and math.isnan(model[3])


def test_fidelity_blank_cells_are_empty_strings(spark):
    """getDisplayValues has no NULL: a blank cell is "" (main.gs:52).
    Spark's CSV reader maps empty cells to NULL, so fidelity mode fills
    them — `src[A] != "x"` on a blank cell must KEEP the row ("" != "x")
    and DIRECT projection must emit "", not NULL.  The property tests'
    VALUES pool is all non-null strings, so only this test covers it."""
    from spreadsheet_etl_engine_spark.plans.parser import parse_mapping
    from spreadsheet_etl_engine_spark.plans.runner import run_mapping

    src = spark.createDataFrame(
        [("1", None), (None, None), ("x", "y")], "A string, B string")
    spec = parse_mapping(
        [("_filter:f", "eval: src[A] != x"), ("OutA", "src[A]"),
         ("OutB", "src[B]")],
        ["A", "B"],
    )
    got = sorted((r["OutA"], r["OutB"]) for r in
                 run_mapping(src, spec, mode="fidelity").collect())
    # Reference: "" != "x" keeps the blank row; blank cells project as "".
    assert got == [("", ""), ("1", "")]

    # "" == "" matches (the reference's two-blank-cells case).
    spec2 = parse_mapping(
        [("_filter:f", "eval: src[A] == src[B]"), ("K", "src[A]")], ["A", "B"])
    assert run_mapping(src, spec2, mode="fidelity").count() == 1  # (None,None)


def test_js_trim_of_rule_literals(spark):
    """Operand literals trim with the ECMA-262 whitespace set, like cell
    values already do: a BOM pasted into a rule (the UTF-8 copy-paste
    case the compiler's parseFloat comment cites) must not turn the
    comparison into always-false NaN; FS (U+001C) must NOT be stripped
    (JS keeps it).  The property tests' LITERALS pool has only plain
    spaces, so only this test covers it."""
    from spreadsheet_etl_engine_spark.plans.parser import parse_mapping
    from spreadsheet_etl_engine_spark.plans.runner import run_mapping

    src = spark.createDataFrame([("5",), ("4",)], "A string")
    spec = parse_mapping(
        [("_filter:f", "eval: src[A] >= ﻿5"), ("K", "src[A]")], ["A"])
    kept = [r["K"] for r in run_mapping(src, spec, mode="fidelity").collect()]
    assert kept == ["5"]  # BOM stripped -> numeric 5, not NaN

    # \x1c is NOT JS whitespace: "\x1c5" parseFloats to NaN -> always false.
    spec2 = parse_mapping(
        [("_filter:f", "eval: src[A] >= \x1c5"), ("K", "src[A]")], ["A"])
    assert run_mapping(src, spec2, mode="fidelity").count() == 0
