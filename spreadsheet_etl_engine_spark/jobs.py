"""End-to-end mapping jobs: the reference's ``runMapping()`` lifecycle
(``main.gs:38-140``) as one engine call.

``run_job`` resolves a :class:`JobConfig` (Dashboard equivalent), loads the
source table, parses the map table, compiles + executes the pipeline, and
writes the output — reporting the produced row count like the reference's
success alert (``main.gs:131-135``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from spreadsheet_etl_engine_spark.config import JobConfig, load_config
from spreadsheet_etl_engine_spark.errors import MissingSheetError
from spreadsheet_etl_engine_spark.plans.parser import parse_map_table
from spreadsheet_etl_engine_spark.plans.runner import run_mapping
from spreadsheet_etl_engine_spark.sources.readers import read_csv
from spreadsheet_etl_engine_spark.sources.writers import write_csv, write_parquet


@dataclass(frozen=True)
class JobResult:
    output: DataFrame
    rows_written: int
    config: JobConfig


def _load_source(spark: SparkSession, name_or_path: str, *, fidelity: bool) -> DataFrame:
    import os

    if name_or_path.endswith(".parquet"):
        return spark.read.parquet(name_or_path)
    if name_or_path.endswith(".csv") or name_or_path.endswith("/"):
        return read_csv(spark, name_or_path, fidelity=fidelity)
    if os.path.isdir(name_or_path):
        # Bare directory: sniff the format from the part files.
        entries = os.listdir(name_or_path)
        if any(e.endswith(".parquet") for e in entries):
            return spark.read.parquet(name_or_path)
        return read_csv(spark, name_or_path, fidelity=fidelity)
    if spark.catalog.tableExists(name_or_path):
        return spark.table(name_or_path)
    raise MissingSheetError(f'Table "{name_or_path}" not found.')


def run_job(
    spark: SparkSession,
    *,
    config: Mapping[str, object] | Sequence[Sequence[object]] | JobConfig | None = None,
    map_table: Sequence[Sequence[object]] | None = None,
    source_df: DataFrame | None = None,
    mode: str = "typed",
    write: bool = True,
) -> JobResult:
    """Run a full mapping job.

    ``config`` follows the Dashboard model (source/map/output, with
    defaults); ``config.source`` may be a parquet/CSV path or a registered
    temp-view name.  Pass ``source_df`` to bypass source resolution (the
    common programmatic path).  ``map_table=None`` loads the rule table
    from ``config.map`` (a two-column path/view, sheet-shaped: header row
    first — the reference's Map sheet as a stored table).  ``config.output``
    is the output path (parquet unless it ends with .csv); ``write=False``
    skips the sink and just returns the DataFrame + count.
    """
    cfg = config if isinstance(config, JobConfig) else load_config(config)
    source = source_df if source_df is not None else _load_source(
        spark, cfg.source, fidelity=(mode == "fidelity")
    )
    if map_table is None:
        map_df = _load_source(spark, cfg.map, fidelity=True)
        # Collecting a rule table is sheet-sized by definition; re-prepend
        # a header row since parse_map_table skips row 0.
        map_table = [map_df.columns] + [list(r) for r in map_df.collect()]
    spec = parse_map_table(map_table, source.columns)
    out = run_mapping(source, spec, mode=mode)
    # The reference reports the produced row count (main.gs:133).  When
    # writing, count the *written* output instead of re-executing the whole
    # pipeline (parquet counts come from file metadata; a second full
    # scan+shuffle would double the job's cost).
    if write:
        if cfg.output.endswith(".csv"):
            write_csv(out, cfg.output)
            rows = spark.read.option("header", "true").csv(cfg.output).count()
        else:
            write_parquet(out, cfg.output)
            rows = spark.read.parquet(cfg.output).count()
    else:
        rows = out.count()
    return JobResult(output=out, rows_written=rows, config=cfg)
