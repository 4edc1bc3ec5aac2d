"""End-to-end job runner tests (the reference runMapping lifecycle)."""

from __future__ import annotations

import pytest

from spreadsheet_etl_engine_spark.errors import MissingSheetError
from spreadsheet_etl_engine_spark.jobs import run_job

MAP_TABLE = [
    ["Rule", "Instruction"],
    ["_filter:big", "eval: src[l_quantity] >= 30"],
    ["OrderKey", "src[l_orderkey]"],
    ["Gross", "formula:=src[l_extendedprice]*(1-src[l_discount])"],
]


def test_run_job_parquet_roundtrip(spark, sf_dir, tmp_path):
    out_path = str(tmp_path / "job_out")
    result = run_job(
        spark,
        config={"source": f"{sf_dir}/lineitem.parquet", "output": out_path},
        map_table=MAP_TABLE,
    )
    assert result.rows_written > 0
    back = spark.read.parquet(out_path)
    assert back.columns == ["OrderKey", "Gross"]
    assert back.count() == result.rows_written


def test_run_job_source_df_no_write(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    result = run_job(spark, map_table=MAP_TABLE, source_df=li, write=False)
    assert result.rows_written == li.filter("l_quantity >= 30").count()


def test_run_job_temp_view_source(spark, sf_dir, tmp_path):
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("li_view")
    result = run_job(
        spark,
        config={"source": "li_view", "output": str(tmp_path / "o")},
        map_table=MAP_TABLE,
        write=False,
    )
    assert result.rows_written > 0


def test_run_job_missing_source(spark, tmp_path):
    with pytest.raises(MissingSheetError):
        run_job(
            spark,
            config={"source": "no_such_table", "output": str(tmp_path / "o")},
            map_table=MAP_TABLE,
            write=False,
        )


def test_run_job_map_table_from_storage(spark, sf_dir, tmp_path):
    """The reference's three-sheet model with every 'sheet' a stored
    table: Dashboard config + Map rules + Source all resolved by path."""
    map_path = str(tmp_path / "map_table")
    spark.createDataFrame(
        [("_filter:big", "eval: src[l_quantity] >= 30"),
         ("OrderKey", "src[l_orderkey]"),
         ("Qty", "src[l_quantity]")],
        ["rule", "instruction"],
    ).coalesce(1).write.mode("overwrite").option("header", "true").csv(map_path)

    result = run_job(
        spark,
        config={"source": f"{sf_dir}/lineitem.parquet", "map": map_path,
                "output": str(tmp_path / "out")},
        map_table=None,
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert result.rows_written == li.filter("l_quantity >= 30").count()
    assert spark.read.parquet(str(tmp_path / "out")).columns == ["OrderKey", "Qty"]
