"""Structured Streaming: each streaming pipeline must equal its batch twin
on the same data (file source, availableNow trigger, memory sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spreadsheet_etl_engine_spark.sources.readers import load_table
from spreadsheet_etl_engine_spark.streaming import events as SE


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream") / "in")
    # Several files so maxFilesPerTrigger yields multiple micro-batches.
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(path)
    return path


def _batch_events(spark, event_dir):
    return spark.read.schema(SE.EVENT_SCHEMA).parquet(event_dir)


def test_tumbling_stream_equals_batch(spark, event_dir):
    stream = SE.read_event_stream(spark, event_dir)
    # complete mode: append would hold back windows the final watermark
    # hasn't passed, so the comparison against batch would miss the tail.
    SE.run_to_memory_sink(SE.tumbling_counts(stream), "t_tumbling", output_mode="complete")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("t_tumbling").collect()
    }
    exp = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in SE.tumbling_counts(_batch_events(spark, event_dir)).collect()
    }
    assert got == exp and len(got) > 0


def test_session_stream_equals_batch(spark, event_dir):
    stream = SE.read_event_stream(spark, event_dir)
    SE.run_to_memory_sink(SE.session_counts(stream), "t_session", output_mode="complete")
    got = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in spark.table("t_session").collect()
    }
    exp = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in SE.session_counts(_batch_events(spark, event_dir)).collect()
    }
    assert got == exp and len(got) > 0


def test_stateful_running_totals(spark, event_dir):
    stream = SE.read_event_stream(spark, event_dir)
    SE.run_to_memory_sink(SE.running_user_totals(stream), "t_state", output_mode="update")
    # The last emitted row per user must equal the batch per-user totals.
    out = spark.table("t_state")
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
        .collect()
    )
    got = {r["user_id"]: r["n_events"] for r in final}
    exp = {
        r["user_id"]: r["n"]
        for r in _batch_events(spark, event_dir).groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == exp and len(got) > 0


def test_watermark_in_plan(spark, event_dir):
    stream = SE.read_event_stream(spark, event_dir)
    agg = SE.tumbling_counts(stream, watermark="42 minutes")
    assert "42 minutes" in agg._jdf.queryExecution().analyzed().toString()


def test_checkpoint_resume_processes_only_new_files(spark, sf_dir, tmp_path):
    """File-sink + checkpoint: restarting the stream picks up where it
    left off — new files only, no reprocessing (exactly-once at the
    file-source level)."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, sf_dir, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.write.mode("overwrite").parquet(src)

    def run_once():
        q = (
            SE.read_event_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()

    second.write.mode("append").parquet(src)
    run_once()
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # No event processed twice.
    assert back.select("event_id").distinct().count() == ev.count()
