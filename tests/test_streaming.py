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


def test_stateful_running_totals(spark):
    import pyspark.sql.functions as FF

    from ncpi_whistler_spark.streaming.stateful import running_user_totals_stream

    stream = running_user_totals_stream(read_events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per user == batch totals
    got_df = spark.table("stateful_test")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(FF.col("n_events").desc())
    final = (
        got_df.withColumn("rn", FF.row_number().over(w)).where("rn = 1").drop("rn")
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 2)) for r in final.collect()}
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(FF.count(FF.lit(1)).alias("n"), FF.sum("value").alias("t"))
    )
    want = {r["user_id"]: (r["n"], round(r["t"], 2)) for r in batch.collect()}
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


def test_enriched_stream_matches_batch(spark):
    from ncpi_whistler_spark.streaming.windows import enriched_stream

    cust = load_table(spark, SF_DIR, "customer")
    stream = enriched_stream(read_events_stream(spark, SF_DIR), cust)
    q = (
        stream.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["c_mktsegment"])
        for r in spark.table("enrich_test").select("event_id", "c_mktsegment").collect()
    }
    batch = (
        load_table(spark, SF_DIR, "events")
        .join(
            cust.select(F.col("c_custkey").alias("user_id"), "c_mktsegment"),
            on="user_id",
            how="left",
        )
    )
    want = {(r["event_id"], r["c_mktsegment"]) for r in batch.collect()}
    assert got == want
