"""Typed-mode end-to-end over driver parquet (SURVEY §7.2 minimum slice)."""

from __future__ import annotations

from spreadsheet_etl_engine_spark.plans.parser import parse_mapping
from spreadsheet_etl_engine_spark.plans.runner import run_mapping


def test_flagship_lineitem(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spec = parse_mapping(
        [
            ("_filter:qty", 'eval: src[l_quantity] >= 30 || src[l_returnflag] == "R"'),
            ("OrderKey", "src[l_orderkey]"),
            ("Status", "constant:Active"),
            ("GrossPrice", "formula:=src[l_extendedprice]*(1-src[l_discount])"),
        ],
        li.columns,
    )
    out = run_mapping(li, spec)
    assert out.columns == ["OrderKey", "Status", "GrossPrice"]
    rows = out.collect()
    assert len(rows) > 0
    # Cross-check against a direct DataFrame computation.
    import pyspark.sql.functions as F

    expected = (
        li.filter((F.col("l_quantity") >= 30) | (F.col("l_returnflag") == "R"))
        .count()
    )
    assert len(rows) == expected
    # OrderKey keeps its native long type in typed mode.
    assert dict(out.dtypes)["OrderKey"] == "bigint"
    assert dict(out.dtypes)["GrossPrice"] == "double"


def test_predicate_pushdown_in_plan(spark, sf_dir):
    """The compiled filter must reach the parquet scan (scale requirement)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spec = parse_mapping(
        [
            ("_filter:qty", "eval: src[l_quantity] >= 30"),
            ("OrderKey", "src[l_orderkey]"),
        ],
        li.columns,
    )
    out = run_mapping(li, spec)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1].split("]")[0]
    # Column pruning: scan schema must not include unused columns.
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema
