"""spreadsheet_etl_engine_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of JuanLoaiza007/Spreadsheet-ETL-Engine.

The reference engine (see /root/reference/main.gs) is a configuration-driven,
row-at-a-time ETL interpreter over Google Sheets: it reads a Source sheet,
applies filter rules and column-mapping rules declared in a Map sheet (in a
small safe DSL), and writes an Output sheet.

This package re-expresses those semantics Spark-first:

- the Map-sheet DSL is parsed once into a :class:`MappingSpec`
  (``plans.parser``) and compiled once into Catalyst ``Column`` expressions
  (``plans.compiler``) — there is no per-row string substitution;
- execution is a declarative ``df.filter(pred).select(cols)`` pipeline
  (``plans.runner``) so predicate pushdown, column pruning, constant folding
  and whole-stage codegen all apply for free;
- the relational surface the reference lists on its roadmap (joins,
  aggregation, sorting, set ops, windows) is provided as thin idiomatic
  wrappers (``operators.relational``);
- large-scale training-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal columns, streaming) live under ``operators/``,
  ``functions/`` and ``streaming/`` and are designed for 100 TB scale
  (broadcast/LSH instead of cross joins, partial aggregation, no
  driver-side loops).
"""

from spreadsheet_etl_engine_spark.config import JobConfig, load_config
from spreadsheet_etl_engine_spark.errors import (
    EngineError,
    InvalidOperatorError,
    MissingColumnError,
    MissingConfigError,
    NoOutputColumnsError,
    UnbalancedDelimiterError,
)
from spreadsheet_etl_engine_spark.plans.parser import (
    FilterRule,
    MappingSpec,
    OutputColumn,
    parse_map_table,
    parse_mapping,
)
from spreadsheet_etl_engine_spark.plans.runner import run_mapping
from spreadsheet_etl_engine_spark.session import get_spark


def run_mapping_v2(*args, **kwargs):
    """Map-DSL v2 (joins + aggregation rule kinds); see plans.extensions."""
    from spreadsheet_etl_engine_spark.plans.extensions import run_mapping_v2 as _impl

    return _impl(*args, **kwargs)


def run_job(*args, **kwargs):
    """Full mapping-job lifecycle (config -> source -> map -> sink); see jobs."""
    from spreadsheet_etl_engine_spark.jobs import run_job as _impl

    return _impl(*args, **kwargs)

__all__ = [
    "EngineError",
    "FilterRule",
    "InvalidOperatorError",
    "JobConfig",
    "MappingSpec",
    "MissingColumnError",
    "MissingConfigError",
    "NoOutputColumnsError",
    "OutputColumn",
    "UnbalancedDelimiterError",
    "get_spark",
    "load_config",
    "parse_map_table",
    "parse_mapping",
    "run_job",
    "run_mapping",
    "run_mapping_v2",
]

__version__ = "0.1.0"
