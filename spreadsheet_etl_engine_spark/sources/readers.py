"""Source readers (the reference's only source is a Google Sheet scan,
``main.gs:51-59``; here: parquet/CSV/JSON natively, Excel via a gated
pandas bridge, with the driver's table layout as a convenience).

Scale notes: all readers return lazy DataFrames; never collect.  CSV in
fidelity mode reads every column as a string, matching the reference's
``getDisplayValues`` semantics (``main.gs:52``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS) which Spark 4
    refuses to read natively; we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
    microseconds with *integer* division (floating division would lose
    precision above 2^53 ns), matching DuckDB's ns→µs truncation.
    """
    # Timestamp-to-string casts in query outputs assume a UTC session —
    # pin it here so driver-created sessions with another TZ still match
    # the (naive-timestamp) DuckDB oracles.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def with_ingest_ordinal(df: DataFrame, *, name: str = "_ordinal") -> DataFrame:
    """Attach a strictly increasing ordinal reflecting scan order.

    The reference's output preserves source row order and its
    ``self[...]`` A1 addresses depend on it (``main.gs:69,118``); Spark
    DataFrames are unordered, so order-dependent features (xlsx
    pass-through, order-faithful exports) sort by this ordinal.  Values
    follow (partition, row) scan order — stable for a given file layout,
    not dense.
    """
    return df.withColumn(name, F.monotonically_increasing_id())


def read_csv(
    spark: SparkSession, path: str, *, fidelity: bool = False, **options: str
) -> DataFrame:
    """CSV scan. ``fidelity=True`` keeps every column a string (display-value
    semantics); otherwise Spark infers a typed schema."""
    reader = spark.read.option("header", "true")
    if fidelity:
        reader = reader.option("inferSchema", "false")
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_excel(
    spark: SparkSession, path: str, *, sheet_name: str | int = 0, fidelity: bool = False
) -> DataFrame:
    """Excel scan via a pandas bridge (no JVM excel datasource in this
    environment).  Suitable for the reference's actual use case —
    spreadsheet-sized inputs; large data belongs in parquet/CSV.

    Requires ``openpyxl`` (gated: raises ImportError with guidance).
    """
    import pandas as pd  # baked in

    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "read_excel requires an Excel engine (openpyxl); install it or "
            "convert the workbook to CSV/parquet"
        ) from e
    pdf = pd.read_excel(path, sheet_name=sheet_name, dtype=str if fidelity else None)
    if fidelity:
        pdf = pdf.fillna("")
    return spark.createDataFrame(pdf)
