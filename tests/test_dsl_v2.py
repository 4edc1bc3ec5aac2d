"""Map-DSL v2 (joins + aggregation rule kinds) tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spreadsheet_etl_engine_spark.errors import EngineError, MissingColumnError
from spreadsheet_etl_engine_spark.plans.extensions import run_mapping_v2
from spreadsheet_etl_engine_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def tpch(spark, sf_dir):
    return {
        "src": load_table(spark, sf_dir, "customer"),
        "nation": load_table(spark, sf_dir, "nation"),
        "region": load_table(spark, sf_dir, "region"),
        "orders": load_table(spark, sf_dir, "orders"),
    }


def test_join_project(spark, tpch):
    out = run_mapping_v2(
        tpch,
        [
            ("_join:nation", "on: src[c_nationkey] == nation[n_nationkey] how: inner broadcast"),
            ("_filter:seg", 'eval: src[c_mktsegment] == "BUILDING"'),
            ("Cust", "src[c_name]"),
            ("Nation", "src[n_name]"),
        ],
    )
    assert out.columns == ["Cust", "Nation"]
    expected = (
        tpch["src"].filter(F.col("c_mktsegment") == "BUILDING")
        .join(tpch["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .count()
    )
    assert out.count() == expected


def test_join_group_agg(spark, tpch):
    out = run_mapping_v2(
        tpch,
        [
            ("_join:nation", "on: src[c_nationkey] == nation[n_nationkey] how: inner broadcast"),
            ("_join:region", "on: src[n_regionkey] == region[r_regionkey] how: inner broadcast"),
            ("_group:g", "by: src[r_name]"),
            ("n_customers", "agg:count"),
            ("total_bal", "agg:sumd:src[c_acctbal]"),
            ("max_bal", "agg:max:src[c_acctbal]"),
        ],
    )
    rows = {r["r_name"]: r for r in out.collect()}
    check = (
        tpch["src"]
        .join(tpch["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .join(tpch["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count("*").alias("n"), F.max("c_acctbal").alias("m"))
    )
    for r in check.collect():
        assert rows[r["r_name"]]["n_customers"] == r["n"]
        assert rows[r["r_name"]]["max_bal"] == r["m"]


def test_avgd_matches_decimal_sum_over_count(spark, tpch):
    """agg:avgd — the deterministic mean (decimal sum / non-NULL count).
    The only other avgd exercise was the grammar's acceptance; this pins
    the value (r9 review find: a modified avgd divisor would have passed
    every gate).  NULL handling rides the NULL-bearing balance planted
    below; the guard inside the sum is pinned by
    test_nonfinite_measure_fails_loud."""
    src = tpch["src"].withColumn(
        "bal2",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal")),
    )
    out = run_mapping_v2(
        {**tpch, "src": src},
        [
            ("_group:g", "by: src[c_mktsegment]"),
            ("avg_bal", "agg:avgd:src[bal2]"),
            ("n", "agg:count:src[bal2]"),
        ],
    )
    rows = {r["c_mktsegment"]: r for r in out.collect()}
    check = src.groupBy("c_mktsegment").agg(
        (F.sum(F.col("bal2").cast("decimal(18,2)")).cast("double")
         / F.count("bal2")).alias("a"),
        F.count("bal2").alias("n"),
    )
    for r in check.collect():
        got = rows[r["c_mktsegment"]]
        assert got["n"] == r["n"]
        assert abs(got["avg_bal"] - r["a"]) < 1e-9


def test_semi_join_hides_right_columns(spark, tpch):
    out = run_mapping_v2(
        tpch,
        [
            ("_join:orders", "on: src[c_custkey] == orders[o_custkey] how: semi"),
            ("Cust", "src[c_custkey]"),
        ],
    )
    # Exact pin vs a direct semi join (r12 test-suite review: a bare
    # `> 0` could not tell a working semi join from a broken one that
    # degraded to inner-with-duplicates or full passthrough).
    expected = tpch["src"].join(
        tpch["orders"],
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    ).count()
    assert out.count() == expected and expected > 0
    with pytest.raises(MissingColumnError):
        run_mapping_v2(
            tpch,
            [
                ("_join:orders", "on: src[c_custkey] == orders[o_custkey] how: semi"),
                ("Bad", "src[o_totalprice]"),  # right side not visible after semi
            ],
        )


def test_v2_errors(spark, tpch):
    with pytest.raises(EngineError, match="Invalid join instruction"):
        run_mapping_v2(tpch, [("_join:nation", "garbage"), ("C", "src[c_name]")])
    with pytest.raises(EngineError, match="Unknown table alias"):
        run_mapping_v2(
            tpch,
            [("_join:bogus", "on: src[c_custkey] == bogus[x] how: inner"), ("C", "src[c_name]")],
        )
    with pytest.raises(EngineError, match="requires at least one agg"):
        run_mapping_v2(tpch, [("_group:g", "by: src[c_mktsegment]"), ("C", "src[c_name]")])
    with pytest.raises(EngineError, match="needs src"):
        run_mapping_v2(
            tpch,
            [("_group:g", "by: src[c_mktsegment]"), ("S", "agg:sum")],
        )


def test_broadcast_hint_applied(spark, tpch):
    out = run_mapping_v2(
        tpch,
        [
            ("_join:nation", "on: src[c_nationkey] == nation[n_nationkey] how: inner broadcast"),
            ("Cust", "src[c_name]"),
        ],
    )
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_having_sort_limit(spark, tpch):
    out = run_mapping_v2(
        tpch,
        [
            ("_join:nation", "on: src[c_nationkey] == nation[n_nationkey] how: inner broadcast"),
            ("_group:g", "by: src[n_name]"),
            ("n_customers", "agg:count"),
            ("max_bal", "agg:max:src[c_acctbal]"),
            ("_having:big", "eval: src[n_customers] >= 5"),
            ("_sort:s", "by: src[n_customers] desc, src[n_name]"),
            ("_limit:top", "3"),
        ],
    )
    rows = out.collect()
    # Exact expected rows from a direct DataFrame computation — an
    # upper-bound-only `<= 3` would stay green if the filter or join
    # broke and returned nothing (r12 test-suite review: the
    # vacuous-empty class).
    expected_n = (
        tpch["src"].join(
            tpch["nation"], F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name").count().filter(F.col("count") >= 5).count()
    )
    assert len(rows) == min(3, expected_n) and expected_n > 0
    counts = [r["n_customers"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c >= 5 for c in counts)
    # sort+limit plans as top-k, not a global sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_sort_limit_without_grouping(spark, tpch):
    out = run_mapping_v2(
        tpch,
        [
            ("Cust", "src[c_name]"),
            ("Bal", "src[c_acctbal]"),
            ("_sort:s", "by: src[Bal] desc"),
            ("_limit:l", "5"),
        ],
    )
    rows = out.collect()
    assert len(rows) == 5
    bals = [r["Bal"] for r in rows]
    assert bals == sorted(bals, reverse=True)


def test_sort_key_and_having_errors_carry_rule_context(spark, tpch):
    """r14 review pass 10: the v2 error channel matches v1's — a
    typo'd _sort: key raises MissingColumnError at PARSE time (not a
    raw Spark UNRESOLVED_COLUMN at run time; sort keys live in the
    output namespace), and a _having: syntax error surfaces at parse
    time under the AUTHOR'S rule name, not a synthetic index."""
    from spreadsheet_etl_engine_spark.errors import (
        ExpressionSyntaxError,
        MissingColumnError,
    )

    with pytest.raises(MissingColumnError, match="Balx"):
        run_mapping_v2(
            tpch,
            [
                ("Cust", "src[c_name]"),
                ("Bal", "src[c_acctbal]"),
                ("_sort:s", "by: src[Balx] desc"),
            ],
        )
    # Grouped mode: the namespace is group keys + agg names.
    with pytest.raises(MissingColumnError, match="nope"):
        run_mapping_v2(
            tpch,
            [
                ("_group:g", "by: src[c_nationkey]"),
                ("n", "agg:count"),
                ("_sort:s", "by: src[nope]"),
            ],
        )
    with pytest.raises(ExpressionSyntaxError, match="_having:bad"):
        run_mapping_v2(
            tpch,
            [
                ("_group:g", "by: src[c_nationkey]"),
                ("n", "agg:count"),
                ("_having:bad", "eval: src[n] >= (1"),
            ],
        )


def test_having_without_agg_raises(spark, tpch):
    from spreadsheet_etl_engine_spark.errors import EngineError

    with pytest.raises(EngineError, match="_having"):
        run_mapping_v2(
            tpch,
            [("_having:x", "eval: src[c_acctbal] > 0"), ("C", "src[c_name]")],
        )


def test_limit_without_sort_raises(spark, tpch):
    """A bare limit keeps an arbitrary run-dependent subset (partition
    arrival order; flips under retries/AQE) — fail loud like
    subset-distinct (r9 re-execution review)."""
    with pytest.raises(EngineError, match="_limit.*requires a _sort"):
        run_mapping_v2(
            tpch, [("_limit:x", "5"), ("C", "src[c_name]")]
        )


def test_bad_limit_raises(spark, tpch):
    from spreadsheet_etl_engine_spark.errors import EngineError

    with pytest.raises(EngineError, match="Limit"):
        run_mapping_v2(tpch, [("_limit:x", "ten"), ("C", "src[c_name]")])


def test_natural_key_join_same_column_name(spark):
    """Both sides share the key column name — the common natural-key case
    must not hit an ambiguous-reference error."""
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])
    dim = spark.createDataFrame([(1, "x"), (3, "y")], ["id", "name"])
    out = run_mapping_v2(
        {"src": left, "dim": dim},
        [
            ("_join:dim", "on: src[id] == dim[id] how: inner"),
            ("Id", "src[id]"),
            ("Val", "src[val]"),
            ("Name", "src[name]"),
        ],
    )
    assert [(r["Id"], r["Val"], r["Name"]) for r in out.collect()] == [(1, "a", "x")]


def test_v2_distinct_full_row(spark):
    from spreadsheet_etl_engine_spark.plans.extensions import run_mapping_v2

    src = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "a")],
        "k long, seg string",
    )
    out = run_mapping_v2(
        {"src": src},
        [("Seg", "src[seg]"), ("_distinct:d", "")],
    )
    assert sorted(r["Seg"] for r in out.collect()) == ["a", "b"]


def test_v2_distinct_rejects_instruction(spark):
    import pytest

    from spreadsheet_etl_engine_spark.errors import EngineError
    from spreadsheet_etl_engine_spark.plans.extensions import parse_mapping_v2

    with pytest.raises(EngineError, match="_distinct takes no instruction"):
        parse_mapping_v2(
            [("Seg", "src[seg]"), ("_distinct:d", "on: src[seg]")],
            {"src": ["seg"]},
        )


def test_v2_and_in_eval_precedence(spark):
    """`&&` binds tighter than `||`: `a || b && c` keeps rows matching a
    OR (b AND c)."""
    src = spark.createDataFrame(
        [(1, 10, "A"), (2, 40, "A"), (3, 40, "B"), (4, 5, "B")],
        "k long, qty long, flag string",
    )
    out = run_mapping_v2(
        {"src": src},
        [
            ("_filter:f",
             'eval: src[k] == 1 || src[qty] >= 30 && src[flag] == "B"'),
            ("K", "src[k]"),
        ],
    )
    assert sorted(r["K"] for r in out.collect()) == [1, 3]


def test_v2_and_across_rules_and_having(spark):
    src = spark.createDataFrame(
        [(1, 10, "A"), (2, 40, "A"), (3, 40, "B"), (4, 45, "B"), (5, 45, "B")],
        "k long, qty long, flag string",
    )
    # Conjunction inside one rule == the v1 two-rule AND.
    one_rule = run_mapping_v2(
        {"src": src},
        [("_filter:f", 'eval: src[qty] >= 30 && src[flag] == "B"'),
         ("K", "src[k]")],
    )
    two_rules = run_mapping_v2(
        {"src": src},
        [("_filter:a", "eval: src[qty] >= 30"),
         ("_filter:b", 'eval: src[flag] == "B"'),
         ("K", "src[k]")],
    )
    assert (sorted(r["K"] for r in one_rule.collect())
            == sorted(r["K"] for r in two_rules.collect()) == [3, 4, 5])

    # _having: accepts the v2 grammar too.
    agg = run_mapping_v2(
        {"src": src},
        [
            ("_group:g", "by: src[flag]"),
            ("N", "agg:count"),
            ("Total", "agg:sum:src[qty]"),
            ("_having:h", "eval: src[N] >= 2 && src[Total] >= 130"),
        ],
    )
    assert [(r["flag"], r["N"]) for r in agg.collect()] == [("B", 3)]


def test_v2_and_malformed_and_silent_false(spark):
    from spreadsheet_etl_engine_spark.errors import InvalidOperatorError
    from spreadsheet_etl_engine_spark.plans.parser import (
        parse_filter_expression,
        parse_filter_expression_v2,
    )

    src = spark.createDataFrame([(1, "x&y"), (2, "b")], "k long, s string")

    # Run of 3+ '&' fails loud at parse time (v2 malformed-operator guard).
    with pytest.raises(InvalidOperatorError):
        run_mapping_v2(
            {"src": src},
            [("_filter:f", "eval: src[k] == 1 &&& src[k] == 2"), ("K", "src[k]")],
        )

    # A lone '&' is literal operand text, exactly as in v1.
    out = run_mapping_v2(
        {"src": src},
        [("_filter:f", 'eval: src[s] == "x&y"'), ("K", "src[k]")],
    )
    assert [r["K"] for r in out.collect()] == [1]

    # Trailing '&&' leaves an operator-less conjunct: silently false,
    # killing its AND-group (composed v1 silent-false discipline).
    out2 = run_mapping_v2(
        {"src": src},
        [("_filter:f", "eval: src[k] == 1 && "), ("K", "src[k]")],
    )
    assert out2.count() == 0

    # v1 grammar untouched: '&&' inside a v1 condition still parses to a
    # malformed/garbage comparison, not a conjunction.
    from spreadsheet_etl_engine_spark.plans.parser import BoolAnd

    (cond,) = parse_filter_expression("src[a] == 1 && src[b] == 2", "r")
    assert cond.malformed  # '==' split produced 3 operands
    tree = parse_filter_expression_v2("src[a] == 1 && src[b] == 2", "r")
    assert isinstance(tree, BoolAnd) and len(tree.children) == 2
    assert not any(c.malformed for c in tree.children)


def test_v2_parens_override_precedence(spark):
    """(a || b) && c — parens regroup what JS precedence would read as
    a || (b && c)."""
    src = spark.createDataFrame(
        [(1, 10, "A"), (2, 40, "A"), (3, 40, "B"), (4, 5, "B")],
        "k long, qty long, flag string",
    )
    grouped = run_mapping_v2(
        {"src": src},
        [
            ("_filter:f",
             'eval: (src[k] == 1 || src[qty] >= 30) && src[flag] == "B"'),
            ("K", "src[k]"),
        ],
    )
    assert sorted(r["K"] for r in grouped.collect()) == [3]
    # Same comparisons without parens: JS precedence keeps k==1 rows too.
    bare = run_mapping_v2(
        {"src": src},
        [
            ("_filter:f",
             'eval: src[k] == 1 || src[qty] >= 30 && src[flag] == "B"'),
            ("K", "src[k]"),
        ],
    )
    assert sorted(r["K"] for r in bare.collect()) == [1, 3]
    # Nesting: ((a) || (b && c)) — redundant parens are harmless.
    nested = run_mapping_v2(
        {"src": src},
        [
            ("_filter:f",
             'eval: ((src[k] == 1) || (src[qty] >= 30 && src[flag] == "B"))'),
            ("K", "src[k]"),
        ],
    )
    assert sorted(r["K"] for r in nested.collect()) == [1, 3]


def test_v2_parens_structural_errors_and_empty_group(spark):
    from spreadsheet_etl_engine_spark.errors import ExpressionSyntaxError

    src = spark.createDataFrame([(1,)], "k long")

    def run(expr):
        return run_mapping_v2(
            {"src": src}, [("_filter:f", f"eval: {expr}"), ("K", "src[k]")]
        )

    with pytest.raises(ExpressionSyntaxError, match="unclosed"):
        run("(src[k] == 1")
    with pytest.raises(ExpressionSyntaxError, match="closing"):
        run("src[k] == 1)")
    # Operand text butted against a group: loud, never a silent misparse
    # (parens are structural everywhere — the scan is blind, like the
    # reference's split on ||).
    with pytest.raises(ExpressionSyntaxError, match="joined by"):
        run("src[k] == (1)")
    with pytest.raises(ExpressionSyntaxError, match="joined by"):
        run("(src[k] == 1) (src[k] == 2)")
    # Empty group: silently false, composing the v1 discipline.
    assert run("() || src[k] == 1").count() == 1
    assert run("() && src[k] == 1").count() == 0


def test_v2_fidelity_fill_covers_join_miss_cells(spark):
    """Fidelity mode's NULL->"" display-string contract must survive an
    outer-join miss: the manufactured NULLs in right-side columns
    compare as "" (kept by != filters) and project as "", exactly like a
    blank cell — r7 review finding: the pre-join fill alone left them
    NULL."""
    src = spark.createDataFrame([("a", "1"), ("b", "2")], ["k", "v"])
    dim = spark.createDataFrame([("a", "x")], ["k", "d"])
    out = run_mapping_v2(
        {"src": src, "dim": dim},
        [
            ("_join:dim", "on: src[k] == dim[k] how: left"),
            ("K", "src[k]"),
            ("D", "dim[d]"),
        ],
        mode="fidelity",
    ).orderBy("K").collect()
    assert [(r["K"], r["D"]) for r in out] == [("a", "x"), ("b", "")]
    # And a != filter keeps the blank cell ("" != "x"), where NULL would
    # have dropped it.
    kept = run_mapping_v2(
        {"src": src, "dim": dim},
        [
            ("_join:dim", "on: src[k] == dim[k] how: left"),
            ("_filter:f", 'eval: dim[d] != "x"'),
            ("K", "src[k]"),
        ],
        mode="fidelity",
    ).collect()
    assert [r["K"] for r in kept] == ["b"]


def test_v2_fidelity_join_tolerates_shared_unreferenced_columns(spark):
    """A string column name shared by both sides but never referenced by
    the mapping must not break fidelity mode — r7 review finding: a
    name-based whole-frame fill raised AMBIGUOUS_REFERENCE on it (the
    fill is now per-join via DataFrame-qualified references)."""
    src = spark.createDataFrame([("a", "n1"), ("b", "n2")], ["k", "notes"])
    dim = spark.createDataFrame([("a", "x", "dn")], ["k", "d", "notes"])
    out = run_mapping_v2(
        {"src": src, "dim": dim},
        [
            ("_join:dim", "on: src[k] == dim[k] how: left"),
            ("K", "src[k]"),
            ("D", "dim[d]"),
        ],
        mode="fidelity",
    ).orderBy("K").collect()
    assert [(r["K"], r["D"]) for r in out] == [("a", "x"), ("b", "")]


def test_v2_fidelity_fill_covers_right_join_miss_cells(spark):
    """`how: right` mirrors the left-join contract: a right-only row's
    LEFT columns are the join-miss cells and must project as "" and
    compare as "" (kept by != filters) — r8 advice finding: only the
    right frame was re-blanked, so a right-join miss leaked NULLs."""
    src = spark.createDataFrame([("a", "1")], ["k", "v"])
    dim = spark.createDataFrame([("a", "x"), ("b", "y")], ["kk", "d"])
    out = run_mapping_v2(
        {"src": src, "dim": dim},
        [
            ("_join:dim", "on: src[k] == dim[kk] how: right"),
            ("K", "src[k]"),
            ("V", "src[v]"),
            ("D", "dim[d]"),
        ],
        mode="fidelity",
    ).orderBy("D").collect()
    assert [(r["K"], r["V"], r["D"]) for r in out] == [("a", "1", "x"), ("", "", "y")]
    # A != filter keeps the blank left cell ("" != "1"), where NULL
    # would have dropped it.
    kept = run_mapping_v2(
        {"src": src, "dim": dim},
        [
            ("_join:dim", "on: src[k] == dim[kk] how: right"),
            ("_filter:f", 'eval: src[v] != "1"'),
            ("D", "dim[d]"),
        ],
        mode="fidelity",
    ).collect()
    assert [r["D"] for r in kept] == ["y"]


def test_v2_right_join_natural_key_keeps_right_identity(spark):
    """A natural-key RIGHT join (same key name both sides) must not
    lose the right-only row's key: the colliding column coalesces
    left-wins-then-right, so the row's identity survives — r8 advice
    finding: the plain left-wins drop emitted NULL for it."""
    src = spark.createDataFrame([("a", 1)], ["k", "lv"])
    dim = spark.createDataFrame([("a", 10), ("b", 20)], ["k", "rv"])
    out = run_mapping_v2(
        {"src": src, "dim": dim},
        [
            ("_join:dim", "on: src[k] == dim[k] how: right"),
            ("K", "src[k]"),
            ("RV", "dim[rv]"),
        ],
    ).orderBy("RV").collect()
    assert [(r["K"], r["RV"]) for r in out] == [("a", 10), ("b", 20)]


def test_v2_right_join_matched_left_null_not_overwritten(spark):
    """A MATCHED left row whose colliding column is genuinely NULL must
    keep that NULL — r8 review finding: a plain coalesce substituted the
    right frame's value because it cannot tell a join-miss NULL from a
    real one (the fallback now keys on a never-NULL matched marker)."""
    src = spark.createDataFrame([("a", None)], "k string, v string")
    dim = spark.createDataFrame(
        [("a", "RIGHT_V"), ("b", "B_V")], "k string, v string"
    )
    out = run_mapping_v2(
        {"src": src, "dim": dim},
        [
            ("_join:dim", "on: src[k] == dim[k] how: right"),
            ("K", "src[k]"),
            ("V", "src[v]"),
        ],
    ).orderBy("K").collect()
    # Matched row 'a': left NULL survives.  Right-only row 'b': identity
    # rescued from the right side, and its v falls back to the right
    # value (the left frame has no row at all there).
    assert [(r["K"], r["V"]) for r in out] == [("a", None), ("b", "B_V")]


def test_v2_right_join_type_mismatched_collision_keeps_left(spark):
    """Colliding columns with DIFFERENT types cannot share one output
    column without a runtime cast (which throws under ANSI — r8 review
    finding), so the identity fallback only applies when types match;
    otherwise plain left-wins semantics hold and the join still runs."""
    src = spark.createDataFrame([("a", 1)], "k string, v long")
    dim = spark.createDataFrame(
        [("a", "sv"), ("b", "bv")], "k string, v string"
    )
    out = run_mapping_v2(
        {"src": src, "dim": dim},
        [
            ("_join:dim", "on: src[k] == dim[k] how: right"),
            ("K", "src[k]"),
            ("V", "src[v]"),
        ],
    ).orderBy("K").collect()
    # No crash; 'b' keeps the (typed) left NULL for v — the mismatched
    # right string is dropped, while the matching-type key column still
    # rescues the row identity.
    assert [(r["K"], r["V"]) for r in out] == [("a", 1), ("b", None)]


def test_v2_sort_orders_nulls_last_both_directions(spark):
    """NULLS LAST pinned on _sort: in BOTH directions (r10 review pass 6):
    Spark's bare asc defaults NULLS FIRST where DuckDB (and the repo-wide
    pinned stance) defaults LAST — with _limit: that silently SELECTS
    different rows per engine on any NULL-able sort key."""
    src = spark.createDataFrame(
        [("a", 2), ("b", None), ("c", 1)], "k string, v long"
    )
    asc = run_mapping_v2(
        {"src": src},
        [("K", "src[k]"), ("_sort:s", "by: src[v] asc"), ("_limit:l", "2")],
    ).collect()
    assert [r["K"] for r in asc] == ["c", "a"]        # NULL row not selected
    desc = run_mapping_v2(
        {"src": src},
        [("K", "src[k]"), ("_sort:s", "by: src[v] desc"), ("_limit:l", "2")],
    ).collect()
    assert [r["K"] for r in desc] == ["a", "c"]
