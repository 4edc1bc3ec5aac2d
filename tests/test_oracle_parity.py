"""Local replica of the driver's correctness gate: every registered query
with an oracle must match DuckDB on the same parquet (row count + column
names + exact values, order-insensitive).  Run at sf0.001 by default
(SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the driver scale).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from spreadsheet_etl_engine_spark import registry
from spreadsheet_etl_engine_spark.sources.readers import TABLE_NAMES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            ser = df[col]
            if getattr(ser.dtype, "tz", None) is not None:
                ser = ser.dt.tz_localize(None)
            df[col] = ser.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].astype("float64")
        elif pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype("Int64")
        elif df[col].dtype == object:
            df[col] = df[col].astype(str).where(~df[col].isna(), None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_query_parity(spark, duck, sf_dir, name):
    rq = registry.get(name)
    got = _normalize(rq.fn(spark, sf_dir).toPandas())
    exp = _normalize(duck.execute(rq.oracle).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows != oracle {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


ORACLE_QUERIES = sorted(n for n, rq in registry.REGISTRY.items() if rq.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_parity(spark, duck, sf_dir, name):
    assert_query_parity(spark, duck, sf_dir, name)


NO_ORACLE = sorted(n for n, rq in registry.REGISTRY.items() if rq.oracle is None)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(spark, sf_dir, name):
    df = registry.get(name).fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    assert out.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 10
