"""Streaming deduplication — dedup ON INGEST (r11 verdict item 7).

All batch dedup (operators/dedup.py) assumes the corpus is at rest; a
real training-data pipeline also dedups the feed as it arrives, with
at-least-once delivery making exact re-deliveries the common case.  Two
operators, both with batch twins so the DuckDB oracle applies:

* :func:`dedup_within_watermark` — exact-copy dedup via
  ``dropDuplicates`` over ALL columns behind a watermark.  Because the
  event-time column is part of the dedup key, Spark evicts seen-key
  state once it falls behind the watermark, so a continuous deployment
  holds only the re-delivery horizon's keys — the difference between
  O(horizon) and O(stream) state.  Final output set ≡ batch
  ``SELECT DISTINCT *`` (order-free, so exactly oracle-able).
* :func:`seen_index_stream` — the ``incremental_dedup`` seen-index
  contract as ARBITRARY STATE (``applyInPandasWithState``): one
  ``(n_copies, min_id)`` state row per content hash — the state-store
  form of the persisted index table ``operators/dedup.py:
  incremental_dedup`` maintains in parquet.  Every emitted quantity is
  arrival-order-independent at final state (count and min are
  commutative), which is what makes a streaming operator batch-oracle-
  able at all — "first seen" by arrival would be micro-batch-layout
  luck.

Fuzzy (band-key) streaming dedup composes from these primitives: key
the state by LSH band instead of the content hash and emit candidate
ids for the verify stage; the state discipline (bounded keys, order-
free emissions) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

# Sentinel for "no non-NULL id seen": keeps the Arrow batch null-free
# int64 (a nullable id column would arrive in pandas as float64 and
# corrupt large ids past 2^53 — the same dtype contract as
# running_user_totals' value_cents) while preserving SQL min()-skips-
# NULLs semantics: any real id compares smaller, and a group that only
# ever saw NULL ids emits NULL.
_NO_ID = (1 << 63) - 1


def read_document_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of document parquet files under ``path`` —
    the documents-table sibling of ``events.read_event_stream``, same
    construction-time column-name validation (a renamed field in a
    by-name format would otherwise read all-NULL forever)."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if files:
        present = set(spark.read.parquet(files[0]).columns)
        missing = [f.name for f in DOC_SCHEMA.fields if f.name not in present]
        if missing:
            raise ValueError(
                f"document stream at {path!r} is missing column(s) "
                f"{missing}; present: {sorted(present)}"
            )
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def dedup_within_watermark(
    stream: DataFrame, ts_col: str, delay: str
) -> DataFrame:
    """Exact-delivery dedup: keep the first arrival of every distinct
    ROW, forget seen keys once they age past the watermark.

    The dedup key is ALL columns — at-least-once redelivery repeats the
    byte-identical record, and a full-row key makes "which copy
    survives" a non-question (any copy is every copy), so the final
    output set equals batch ``SELECT DISTINCT *`` under any micro-batch
    layout or retry.  Including ``ts_col`` in the key is also what lets
    Spark EVICT state behind the watermark; dedup on a subset without
    the event-time column would grow seen-key state forever (the
    ``dropDuplicatesWithinWatermark`` variant exists for that shape).
    ``delay`` is the re-delivery horizon: a copy arriving later than
    this slips through — size it like the stream-stream join watermark
    (a backfill run must cover the replayed span; continuous runs use
    the transport's real redelivery bound).

    Epoch-floor contract: Spark's watermark is monotone from 0 ms and
    the late predicate is INCLUSIVE, so a row whose event time is
    exactly 1970-01-01T00:00:00Z, processed in a later micro-batch
    than any newer file, ties the floored watermark and is silently
    dropped as late NO MATTER how large ``delay`` is (found by the r12
    edge sweep: a corrupt epoch timestamp is routine corpus garbage).
    The operator therefore watermarks a derived column clamped to
    epoch+1 day — rows in that first day are treated as 1 day newer
    for watermark accounting only (never wrongly dropped, eviction at
    most 1 day later); the clamp column joins the all-columns dedup
    key, which changes nothing (it is a pure function of ``ts_col``,
    so exact copies still collide and distinct rows still don't).
    """
    wm = F.greatest(
        F.col(ts_col),
        F.lit("1970-01-02 00:00:00").cast("timestamp"),
    )
    return (
        stream.withColumn("__wm_ts", wm)
        .withWatermark("__wm_ts", delay)
        .dropDuplicates()
        .drop("__wm_ts")
    )


def seen_index_stream(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Running content-hash seen-index: one state row per distinct
    ``md5(text)`` holding ``(n_copies, min id)``; emits the updated
    ``(content_hash, rep_doc_id, n_copies)`` row each micro-batch.

    The final emission per hash is the batch ``exact_dedup`` row
    (count + min-id representative) regardless of arrival order —
    count and min are the commutative core of the survivorship
    contract, which is why this is oracle-able while a "first arrival
    wins" index is not.  State is one 16-byte row per distinct hash;
    the continuous-deployment bound is the same as the parquet index
    in ``incremental_dedup`` (distinct content, not corpus rows), with
    RocksDB state-store backing at 100 TB.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    output_schema = "content_hash string, rep_doc_id long, n_copies long"
    state_schema = "n long, min_id long"

    def update(key, pdf_iter, state):
        import numpy as np

        n, min_id = state.get if state.exists else (0, _NO_ID)
        for pdf in pdf_iter:
            n += len(pdf)
            ids = pdf["id_nn"]
            if not np.issubdtype(ids.dtype, np.integer):
                raise TypeError(
                    f"id_nn arrived as {ids.dtype}, not int64 — the "
                    "seen-index contract requires the null-free sentinel "
                    "column (see the coalesce in seen_index_stream)"
                )
            if len(ids):
                min_id = min(min_id, min(ids.tolist()))
        state.update((n, min_id))
        yield pd.DataFrame(
            {
                "content_hash": [key[0]],
                "rep_doc_id": [None if min_id == _NO_ID else min_id],
                "n_copies": [n],
            }
        )

    return (
        docs.select(
            F.md5(F.col(text_col)).alias("content_hash"),
            F.coalesce(
                F.col(id_col).cast("long"), F.lit(_NO_ID).cast("long")
            ).alias("id_nn"),
        )
        .groupBy("content_hash")
        .applyInPandasWithState(
            update, output_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )
