"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship DSL query at sf0.001 (smoke check).
``queries()`` / ``oracle_sql()`` expose the full operator inventory from
``spreadsheet_etl_engine_spark.registry`` — one entry per implemented
operator from SURVEY.md §2, each with a DuckDB-runnable ANSI-SQL oracle
(entries without an oracle are approximate/non-SQL-expressible ops and get
the driver's rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spreadsheet_etl_engine_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.get("dsl_flagship").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
