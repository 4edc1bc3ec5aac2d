"""Pipeline runner: the whole reference engine as one declarative plan.

The reference's execution loop (``main.gs:67-119``) — filter each row, then
project — compiles to exactly ``source.filter(pred).select(cols)``.  Filter
before select keeps the predicate adjacent to the scan so Catalyst pushes it
into the parquet/CSV reader (check ``PushedFilters`` in
``df.explain("formatted")``), and the explicit select list drives column
pruning (``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from spreadsheet_etl_engine_spark.errors import EmptyHeadersError
from spreadsheet_etl_engine_spark.plans.compiler import compile_mapping
from spreadsheet_etl_engine_spark.plans.parser import MappingSpec


def fidelity_fill(df: DataFrame) -> DataFrame:
    """Fidelity-mode NULL→"" fill for every string column.

    getDisplayValues has no NULL: a blank cell IS the empty string
    (main.gs:52), and Spark's CSV reader maps empty cells to NULL.
    Without this fill, `src[A] != "x"` on a blank cell compiles to
    NULL != 'x' -> NULL -> row dropped, where the reference keeps
    it ("" != "x"), and DIRECT projection emits NULL instead of "".
    Shared by run_mapping and run_mapping_v2 so both execution paths
    carry identical display-string semantics.
    """
    fills = {f.name: "" for f in df.schema.fields
             if f.dataType.simpleString() == "string"}
    return df.na.fill(fills) if fills else df


def run_mapping(source: DataFrame, spec: MappingSpec, *, mode: str = "typed") -> DataFrame:
    """Apply a parsed mapping to a source DataFrame.

    ``mode='typed'`` keeps native column types (idiomatic for parquet
    sources); ``mode='fidelity'`` reproduces the reference's display-string
    semantics exactly (every output column is a string).
    """
    if not source.columns:
        raise EmptyHeadersError()  # reference main.gs:55-56
    if mode == "fidelity":
        source = fidelity_fill(source)
    predicate, columns = compile_mapping(source, spec, mode=mode)
    out = source
    if predicate is not None:
        out = out.filter(predicate)
    return out.select(*columns)
