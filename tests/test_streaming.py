"""Streaming windows replay the parquet events fixture and must agree
with their batch twins (q18/q19 grouping semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ncpi_whistler_spark.catalog import load_table
from ncpi_whistler_spark.streaming.windows import (
    hourly_counts_stream,
    read_events_stream,
    run_stream_to_memory,
    session_counts_stream,
)
from tests.conftest import SF_DIR


def test_hourly_stream_matches_batch(spark):
    stream = hourly_counts_stream(read_events_stream(spark, SF_DIR))
    run_stream_to_memory(stream, "hourly_test")
    got = {
        (r["hour"], r["event_type"]): r["n"]
        for r in spark.table("hourly_test").collect()
    }
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["hour"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_dedup_stream(spark):
    from ncpi_whistler_spark.streaming.windows import dedup_stream

    stream = dedup_stream(read_events_stream(spark, SF_DIR), ["user_id", "event_type"])
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_test").count()
    want = (
        load_table(spark, SF_DIR, "events")
        .dropDuplicates(["user_id", "event_type"])
        .count()
    )
    assert got == want


def test_session_stream_sane(spark):
    stream = session_counts_stream(read_events_stream(spark, SF_DIR))
    run_stream_to_memory(stream, "session_test")
    rows = spark.table("session_test").collect()
    assert rows
    total = sum(r["n_events"] for r in rows)
    assert total == load_table(spark, SF_DIR, "events").count()
    # session windows must respect the 30-min gap: end-start covers events
    for r in rows[:50]:
        assert r["session_end"] > r["session_start"]
