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
    if name_or_path.endswith(".json"):
        from spreadsheet_etl_engine_spark.sources.readers import read_json

        return read_json(spark, name_or_path, fidelity=fidelity)
    if name_or_path.endswith(".xlsx"):
        from spreadsheet_etl_engine_spark.sources.readers import read_excel

        return read_excel(spark, name_or_path, fidelity=fidelity)
    if name_or_path.endswith(".orc"):
        from spreadsheet_etl_engine_spark.sources.readers import read_orc

        return read_orc(spark, name_or_path, fidelity=fidelity)
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
    is the output path (parquet unless it ends with .csv or .orc);
    ``write=False`` skips the sink and just returns the DataFrame + count.
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
        elif cfg.output.endswith(".orc"):
            from spreadsheet_etl_engine_spark.sources.writers import write_orc

            write_orc(out, cfg.output)
            rows = spark.read.orc(cfg.output).count()
        else:
            write_parquet(out, cfg.output)
            rows = spark.read.parquet(cfg.output).count()
    else:
        rows = out.count()
    return JobResult(output=out, rows_written=rows, config=cfg)


def run_workbook(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    *,
    mode: str = "fidelity",
    passthrough: bool = False,
    max_rows: int = 1_048_576,
) -> JobResult:
    """The reference's ENTIRE lifecycle on one workbook file
    (``main.gs:38-140``): read the Dashboard sheet (key/value config,
    defaults when absent), the Map sheet (rule table) and the source
    sheet from ``in_path``; compile and run the mapping; write
    ``out_path`` as the same workbook with the output sheet replaced
    (the reference clears and rewrites ``Output`` in place,
    ``main.gs:124-129``; a file sink takes an explicit destination
    instead — pass ``out_path == in_path`` for true in-place).

    ``mode='fidelity'`` (default) is ``getDisplayValues`` semantics:
    every cell a display string, exactly the reference's data model.
    ``passthrough=True`` additionally emits FORMULA columns as formula
    *text* with ``self[...]`` resolved to A1 addresses over surviving
    rows (deferred evaluation, ``main.gs:86-114``) — the codec writes
    ``=``-strings as live formula cells, so the output workbook
    recalculates in a spreadsheet app just like the reference's.

    Workbook-sized by design (driver-side; the 100 TB path is
    ``run_job`` over parquet).
    """
    from spreadsheet_etl_engine_spark.sources import xlsx_native
    from spreadsheet_etl_engine_spark.sources.readers import read_excel
    from spreadsheet_etl_engine_spark.sources.writers import (
        formula_passthrough_columns,
    )

    names = xlsx_native.sheet_names(in_path)
    if "Dashboard" in names:
        d_header, d_rows, _ = xlsx_native.read_workbook(
            in_path, sheet_name="Dashboard"
        )
        # The reference iterates every Dashboard row as a key/value pair
        # (main.gs:146-154) — there is no header row to skip; unknown
        # keys (including a decorative "Key"/"Value" row) are ignored.
        cfg = load_config([d_header] + d_rows)
    else:
        cfg = load_config(None)
    for sheet in (cfg.source, cfg.map):
        if sheet not in names:
            raise MissingSheetError(f'Table "{sheet}" not found.')
    m_header, m_rows, _ = xlsx_native.read_workbook(in_path, sheet_name=cfg.map)
    map_table = [m_header] + m_rows
    source = read_excel(spark, in_path, sheet_name=cfg.source, fidelity=True)
    spec = parse_map_table(map_table, source.columns)
    if passthrough:
        ordered = formula_passthrough_columns(source, spec)
        out = ordered.orderBy("_row").drop("_row")
    else:
        out = run_mapping(source, spec, mode=mode)
    out_rows = [tuple(r) for r in out.limit(max_rows).collect()]

    def _revive(value: str, was_numeric: bool):
        # Cells that were number cells round-trip as numbers, not
        # inline strings (formula cells already carry their '=' prefix).
        if not was_numeric:
            return value
        try:
            return int(value)
        except ValueError:
            return float(value)

    # Preserve every non-output sheet of the input workbook, replacing
    # (or appending) the output sheet — the reference's in-place shape.
    sheets: list[tuple[str, list[str], list[tuple]]] = []
    for name in names:
        if name == cfg.output:
            continue
        header, rows, flags = xlsx_native.read_workbook(in_path, sheet_name=name)
        revived = [
            tuple(_revive(v, f) for v, f in zip(r, fl))
            for r, fl in zip(rows, flags)
        ]
        sheets.append((name, header, revived))
    sheets.append((cfg.output, list(out.columns), out_rows))
    xlsx_native.write_workbook_multi(out_path, sheets)
    return JobResult(output=out, rows_written=len(out_rows), config=cfg)
