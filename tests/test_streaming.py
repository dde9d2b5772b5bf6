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


def test_stateful_exact_cents_matches_duckdb_cast(spark, tmp_path):
    """exact_cents must round EXACTLY like the q88 oracle's DuckDB
    CAST(value AS DECIMAL(18,2)) — HALF_UP on the SHORTEST DECIMAL REPR
    of the double (0.125→0.13, 2.675→2.68 even though 2.675*100
    binary-evaluates to 267.49999…), which is also what Spark's own
    decimal cast does. Binary-value rounding (pandas .round half-even,
    np.floor(v*100+0.5)) drifts one cent on the adversarial values
    below; the production accumulator uses Decimal(repr(v)) HALF_UP."""
    import duckdb
    import pyspark.sql.functions as FF

    from ncpi_whistler_spark.streaming.stateful import running_user_totals_stream

    src = tmp_path / "ev"
    vals = [0.125, 0.125, -0.125, 2.675, 1.005, 0.135]
    spark.createDataFrame(
        [(1, float(v), "2024-01-01 00:00:%02d" % i) for i, v in enumerate(vals)],
        "user_id long, value double, ts string",
    ).withColumn("ts", FF.to_timestamp("ts")).write.parquet(str(src))

    stream_src = (
        spark.readStream.schema("user_id long, value double, ts timestamp")
        .parquet(str(src))
    )
    q = (
        running_user_totals_stream(stream_src, exact_cents=True)
        .writeStream.format("memory")
        .queryName("cents_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = (
        spark.table("cents_test")
        .orderBy(FF.col("n_events").desc())
        .first()
    )
    want = duckdb.connect().execute(
        "SELECT SUM(CAST(value AS DECIMAL(18,2))) "
        f"FROM read_parquet('{src}/*.parquet')"
    ).fetchone()[0]
    assert final["n_events"] == len(vals)
    assert abs(final["total_value"] - float(want)) < 1e-9, (
        f"stream {final['total_value']} != duckdb decimal {want}"
    )


def _drop_events(spark, dirpath, rows):
    import pyspark.sql.functions as FF

    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, ts string"
    ).withColumn("ts", FF.to_timestamp("ts")).coalesce(1).write.mode(
        "append"
    ).parquet(str(dirpath))


def test_watermark_bounds_state_and_drops_late(spark, tmp_path):
    """THE thing watermarks exist for, driven across 3 explicit
    micro-batches: state-store rows are evicted as event time advances
    (bounded state), and a row arriving beyond the watermark is dropped,
    not aggregated. Asserted from the engine's own progress metrics
    (stateOperators.numRowsTotal / numRowsDroppedByWatermark)."""
    from ncpi_whistler_spark.streaming.windows import hourly_counts_stream

    src = tmp_path / "ev"
    src.mkdir()
    # batch 1: three 1-hour windows at hours 0-2
    _drop_events(
        spark,
        src,
        [(i, 1, "click", 1.0, f"2024-01-01 0{h}:15:00") for i, h in enumerate([0, 1, 2])],
    )
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double, ts timestamp"
        ).parquet(str(src))
    )
    q = (
        hourly_counts_stream(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("wm_bound_test")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        state_b1 = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        assert state_b1 >= 3  # all three open windows held

        # batch 2: jump to hours 10-12 -> watermark 10:00, hours 0-2 close
        _drop_events(
            spark,
            src,
            [(10 + i, 1, "click", 1.0, f"2024-01-01 {h}:15:00") for i, h in enumerate([10, 11, 12])],
        )
        q.processAllAvailable()

        # batch 3: hour 20 plus one LATE row at hour 1 (far beyond the
        # 2h watermark) -> late row dropped, old window state evicted
        _drop_events(
            spark,
            src,
            [
                (20, 1, "click", 1.0, "2024-01-01 20:15:00"),
                (99, 1, "click", 100.0, "2024-01-01 01:20:00"),
            ],
        )
        q.processAllAvailable()
        # one more empty-ish advance so eviction for the 20:00 watermark runs
        _drop_events(spark, src, [(21, 1, "click", 1.0, "2024-01-01 21:15:00")])
        q.processAllAvailable()

        progresses = [p for p in q.recentProgress if p.get("stateOperators")]
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in progresses
        )
        assert dropped >= 1, "late row was not dropped by the watermark"
        final_state = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        # 7 windows were ever opened; only those >= watermark-horizon may
        # remain. Eviction = state does NOT accumulate across batches.
        assert final_state < 7, f"state grew unbounded: {final_state} rows"
    finally:
        q.stop()

    # the late row's window (hour 01) was finalized in batch 2 WITHOUT the
    # late value: count 1, sum 1.0 — not 101.0
    out = {
        (r["hour"].hour): (r["n"], r["sum_value"])
        for r in spark.table("wm_bound_test").collect()
    }
    assert out[1] == (1, 1.0)


def test_dedup_stream_state_bounded(spark, tmp_path):
    """dropDuplicatesWithinWatermark state is evicted once event time
    moves a key's horizon past the watermark: a re-arrival of an old key
    AFTER eviction is treated as new (the bounded-state contract), and
    the state row count tracks the horizon, not total keys ever seen."""
    from ncpi_whistler_spark.streaming.windows import dedup_stream

    src = tmp_path / "ev"
    src.mkdir()
    _drop_events(
        spark,
        src,
        [
            (1, 1, "click", 1.0, "2024-01-01 00:00:00"),
            (1, 1, "click", 1.0, "2024-01-01 00:05:00"),  # dup within wm
            (2, 1, "click", 1.0, "2024-01-01 00:10:00"),
        ],
    )
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double, ts timestamp"
        ).parquet(str(src))
    )
    q = (
        dedup_stream(stream, keys=["event_id"], watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_bound_test")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 2

        # advance far past the watermark horizon -> both keys evicted
        _drop_events(spark, src, [(3, 1, "click", 1.0, "2024-01-01 12:00:00")])
        q.processAllAvailable()
        _drop_events(spark, src, [(4, 1, "click", 1.0, "2024-01-01 13:00:00")])
        q.processAllAvailable()
        state = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        assert state <= 2, f"evicted keys still in state: {state}"

        # old key re-arrives after eviction -> passes as new
        _drop_events(spark, src, [(1, 1, "click", 1.0, "2024-01-01 13:05:00")])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("dedup_bound_test").collect()
    ids = [r["event_id"] for r in rows]
    assert sorted(ids)[:4] == [1, 1, 2, 3], f"unexpected emissions: {sorted(ids)}"


def _events_batches(spark, n_batches=2):
    """The events fixture split into restart-boundary batches by event id
    (every user with ≥ n_batches events appears in several batches, so a
    lost state store could not produce correct totals)."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value", "ts"
    )
    return [
        ev.where(F.col("event_id") % n_batches == i).drop("event_id")
        for i in range(n_batches)
    ]


def _final_totals(drained):
    """Last emission per user (n_events is strictly increasing)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        drained.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "n_events", "total_value")
    )


def _batch_totals(spark):
    return (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def test_stateful_restart_exactly_once_hdfs(spark, tmp_path):
    _restart_exactly_once(spark, tmp_path, "hdfs", ".delta")


def test_stateful_restart_exactly_once_rocksdb(spark, tmp_path):
    _restart_exactly_once(spark, tmp_path, "rocksdb", ".zip")


def _restart_exactly_once(spark, tmp_path, provider, state_file_suffix):
    """THE fault-tolerance contract, under both state-store backends: a
    stateful query (the q88 shape) stopped after batch 1 and RESTARTED
    as a new query from the same checkpointLocation must (a) resume
    after the committed offsets (no source rows re-read), (b) restore
    the per-user accumulators (batch-2 emissions continue from batch-1
    counts — a fresh state store could not produce them), and (c) emit
    nothing on a third restart with an empty batch. Final totals must
    equal the batch GROUP BY oracle exactly. Also pins that the chosen
    provider actually ran, via its on-disk state-file format (.delta =
    HDFS-backed, .zip = RocksDB snapshot)."""
    import pathlib

    from ncpi_whistler_spark.streaming.recovery import drain_batches_with_restart
    from ncpi_whistler_spark.streaming.stateful import running_user_totals_stream

    b1, b2 = _events_batches(spark)
    empty = b1.limit(0)
    drained = drain_batches_with_restart(
        spark,
        [b1, b2, empty],
        lambda s: running_user_totals_stream(s, exact_cents=True),
        str(tmp_path),
        state_store=provider,
    )
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 2))
        for r in _final_totals(drained).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 2))
        for r in _batch_totals(spark).collect()
    }
    assert got == want

    # (b) explicitly: every batch-2 emission CONTINUES the batch-1 count —
    # its n_events equals the user's full-fixture count, which is only
    # possible if batch-1 state survived the stop/start boundary
    run2 = drained.where("batch = 1")
    cont = run2.join(
        _batch_totals(spark).select("user_id", F.col("n_events").alias("want_n")),
        on="user_id",
    )
    bad = cont.where("n_events != want_n").count()
    assert bad == 0, f"{bad} users lost accumulator state across restart"
    assert run2.count() > 0

    # (c) empty third restart: offsets committed, nothing re-emitted
    assert drained.where("batch = 2").count() == 0

    # the selected backend really ran: its state-file format is on disk
    state_files = [
        p.name for p in pathlib.Path(tmp_path, "cp", "state").rglob("*") if p.is_file()
    ]
    assert any(n.endswith(state_file_suffix) for n in state_files), (
        f"no {state_file_suffix} state files — provider {provider} not engaged: "
        f"{state_files[:10]}"
    )


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_dedup_state_survives_restart(spark, tmp_path):
    """dropDuplicatesWithinWatermark's seen-keys state is the second
    stateful operator class (after the q88 accumulator) that must
    survive a restart: a key re-sent AFTER the stop/start boundary,
    within the watermark horizon, must still be suppressed — a fresh
    state store would pass it through as new."""
    from ncpi_whistler_spark.streaming.recovery import drain_batches_with_restart
    from ncpi_whistler_spark.streaming.windows import dedup_stream

    b1 = _mk_events(spark, [(1, 1, "c", 1.0, "2024-01-01 00:00:00"),
                            (2, 1, "c", 1.0, "2024-01-01 00:10:00")])
    # batch 2 re-sends key 1 (within the 2h horizon) + a fresh key 3
    b2 = _mk_events(spark, [(1, 1, "c", 1.0, "2024-01-01 00:20:00"),
                            (3, 1, "c", 1.0, "2024-01-01 00:30:00")])
    got = drain_batches_with_restart(
        spark, [b1, b2], lambda s: dedup_stream(s, ["event_id"]),
        str(tmp_path), output_mode="append",
    )
    emitted = sorted((r["batch"], r["event_id"]) for r in got.collect())
    run1 = [e for b, e in emitted if b <= 1]
    run2 = [e for b, e in emitted if b > 1]
    assert sorted(run1) == [1, 2]
    assert run2 == [3], (
        f"duplicate key re-emitted after restart (state lost): {emitted}"
    )


def test_window_state_and_watermark_survive_restart(spark, tmp_path):
    """Watermarked window aggregation across a restart pins THREE
    recovery properties at once: (a) a window closed+emitted in run 1
    is NEVER re-emitted by run 2 (append-mode exactly-once), (b) the
    WATERMARK itself is restored — a late row behind it, arriving after
    the restart, is dropped and creates no window, and (c) a window
    still open at the restart boundary closes in run 2 with its run-1
    contents intact."""
    from ncpi_whistler_spark.streaming.recovery import drain_batches_with_restart
    from ncpi_whistler_spark.streaming.windows import hourly_counts_stream

    # run 1: hour-0 row + hour-5 row -> watermark 03:00 after the batch;
    # the no-data finalization batch closes hour 0, hour 5 stays open
    b1 = _mk_events(spark, [(10, 1, "c", 1.0, "2024-01-01 00:15:00"),
                            (11, 1, "c", 1.0, "2024-01-01 05:15:00")])
    # run 2: a LATE hour-1 row (behind the restored 03:00 watermark,
    # value 100 so pollution would be visible) + an hour-10 row that
    # advances the watermark past hour 5's end
    b2 = _mk_events(spark, [(12, 1, "c", 100.0, "2024-01-01 01:15:00"),
                            (13, 1, "c", 1.0, "2024-01-01 10:15:00")])
    got = drain_batches_with_restart(
        spark, [b1, b2], lambda s: hourly_counts_stream(s),
        str(tmp_path), output_mode="append",
    )
    rows = sorted(
        (r["batch"], r["hour"].hour, r["n"], r["sum_value"])
        for r in got.collect()
    )
    hours = [(h, n, s) for _, h, n, s in rows]
    # (a) hour 0 exactly once, from run 1; (c) hour 5 closes in run 2
    assert hours == [(0, 1, 1.0), (5, 1, 1.0)], rows
    run1_batches = {b for b, h, _, _ in rows if h == 0}
    run2_batches = {b for b, h, _, _ in rows if h == 5}
    assert max(run1_batches) < min(run2_batches)
    # (b) the late row neither created an hour-1 window nor polluted any
    # sum (its 100.0 appears nowhere)
    assert not any(h == 1 for h, _, _ in hours)
    assert not any(s >= 100.0 for _, _, s in hours)


def test_restart_replays_uncommitted_batch_idempotently(spark, tmp_path):
    """Crash-mid-batch simulation: delete the LAST commit marker (the
    crash window between the sink write and the commit log append), then
    restart. Spark must replay that micro-batch — and the batchId-keyed
    foreachBatch parquet sink must absorb the replay by overwrite, so
    totals carry no duplicates. This is the exactly-once half the happy
    path never exercises."""
    import os

    from ncpi_whistler_spark.streaming.recovery import drain_batches_with_restart
    from ncpi_whistler_spark.streaming.stateful import running_user_totals_stream

    b1, b2 = _events_batches(spark)
    plan = lambda s: running_user_totals_stream(s, exact_cents=True)  # noqa: E731
    drained = drain_batches_with_restart(spark, [b1, b2], plan, str(tmp_path))
    n_batches_before = drained.select("batch").distinct().count()

    commit_dir = os.path.join(tmp_path, "cp", "commits")
    # commit filenames are batch ids — numeric sort, or '9' > '10'
    last = sorted(
        (n for n in os.listdir(commit_dir) if not n.startswith(".")), key=int
    )[-1]
    os.remove(os.path.join(commit_dir, last))
    crc = os.path.join(commit_dir, f".{last}.crc")  # local-FS checksum twin
    if os.path.exists(crc):
        os.remove(crc)

    # restart with NO new data: the uncommitted batch replays into the
    # same batch=<id> directory
    replayed = drain_batches_with_restart(
        spark, [b1.limit(0)], plan, str(tmp_path)
    )
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 2))
        for r in _final_totals(replayed).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 2))
        for r in _batch_totals(spark).collect()
    }
    assert got == want, "replayed batch produced duplicate or lost rows"
    # replay overwrote in place: no extra batch directory beyond the
    # empty-batch round's
    n_after = replayed.select("batch").distinct().count()
    assert n_after <= n_batches_before + 1


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


def test_kafka_source_swap(spark, tmp_path):
    """The config-driven source swap is executable: a kafka-record-shaped
    stream (binary key/value + topic metadata, exactly what the kafka
    reader emits) decoded by parse_kafka_events feeds the SAME
    hourly-counts plan as the file source and produces identical results
    — proving the window plans are source-agnostic, not just documented
    as such."""
    import pyspark.sql.types as T

    from ncpi_whistler_spark.catalog import ensure_event_time
    from ncpi_whistler_spark.streaming.windows import (
        parse_kafka_events,
        read_events_stream_config,
    )

    # Build a kafka-shaped replay of the events fixture on disk.
    ev = ensure_event_time(load_table(spark, SF_DIR, "events"), "ts")
    kafka_shaped = ev.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
        ).cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )
    kdir = str(tmp_path / "kafka_replay")
    kafka_shaped.write.parquet(kdir)

    raw = spark.readStream.schema(kafka_shaped.schema).parquet(kdir)
    decoded = parse_kafka_events(raw)
    # Decoded records carry the canonical schema the plans contract on.
    assert decoded.schema == read_events_stream_config(
        spark, {"source": "file", "sf_dir": SF_DIR}
    ).select(*[f.name for f in decoded.schema.fields]).schema
    assert isinstance(dict(decoded.dtypes)["ts"], str)
    assert [f.dataType for f in decoded.schema.fields if f.name == "ts"] == [
        T.TimestampType()
    ]

    run_stream_to_memory(hourly_counts_stream(decoded), "kafka_hourly_test")
    got = {
        (r["hour"], r["event_type"]): r["n"]
        for r in spark.table("kafka_hourly_test").collect()
    }
    run_stream_to_memory(
        hourly_counts_stream(
            read_events_stream_config(spark, {"source": "file", "sf_dir": SF_DIR})
        ),
        "file_hourly_test",
    )
    want = {
        (r["hour"], r["event_type"]): r["n"]
        for r in spark.table("file_hourly_test").collect()
    }
    assert got == want and got


def test_stream_source_config_rejects_unknown(spark):
    import pytest

    from ncpi_whistler_spark.streaming.windows import read_events_stream_config

    with pytest.raises(ValueError, match="unknown stream source"):
        read_events_stream_config(spark, {"source": "pulsar"})


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


def test_stream_interval_join_multibatch_watermark(spark, tmp_path):
    """The §2.10 semantics q99's single-batch drain can't exercise: the
    interval join under REAL late data, across two explicit
    micro-batches with out-of-order events.

    Batch 1 carries an on-time view/purchase pair plus far-future
    events on BOTH branches (the global watermark is the MIN over the
    plan's watermark nodes, and each branch tracks its own max event
    time AFTER its event_type filter — a far-future view alone leaves
    the purchase branch's watermark at epoch and nothing ever drops);
    batch 2 carries (a) a late view/purchase pair whose event times sit
    BEHIND the advanced watermark — the engine must drop those input
    rows, so their join never appears — and (b) a fresh on-time pair
    that must join. Pins:

    1. drained rows == the batch interval-join oracle restricted to the
       watermark window (i.e. computed over the non-late rows only),
    2. the late pair — present in the unrestricted batch oracle — is
       absent, and the engine's own numRowsDroppedByWatermark metric
       counts the late rows."""
    from ncpi_whistler_spark.streaming.windows import view_purchase_interval_join

    src = tmp_path / "ev"
    src.mkdir()
    # batch 1: pair (1 -> 2) 10 min apart; events 9/10 at +6h (distinct
    # users, same timestamp so they cannot join each other under the
    # strict p.ts > v.ts condition) push BOTH branches' watermarks
    # (2h delay) to 04:00 for the next batch
    _drop_events(
        spark,
        src,
        [
            (1, 1, "view", 1.0, "2024-01-01 00:00:00"),
            (2, 1, "purchase", 1.0, "2024-01-01 00:10:00"),
            (9, 9, "view", 1.0, "2024-01-01 06:00:00"),
            (10, 8, "purchase", 1.0, "2024-01-01 06:00:00"),
        ],
    )
    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string, value double, ts timestamp"
    ).parquet(str(src))
    joined = view_purchase_interval_join(stream)
    q = (
        joined.writeStream.format("memory")
        .queryName("sij_wm_test")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: pair (3 -> 4) is LATE (00:05/00:20 < the 04:00
        # watermark) -> dropped on input; pair (5 -> 6) is on-time
        _drop_events(
            spark,
            src,
            [
                (3, 2, "view", 1.0, "2024-01-01 00:05:00"),
                (4, 2, "purchase", 1.0, "2024-01-01 00:20:00"),
                (5, 3, "view", 1.0, "2024-01-01 05:00:00"),
                (6, 3, "purchase", 1.0, "2024-01-01 05:30:00"),
            ],
        )
        q.processAllAvailable()
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
    finally:
        q.stop()

    got = {
        (r["view_id"], r["purchase_id"], r["lag_us"])
        for r in spark.table("sij_wm_test").collect()
    }
    # on-time results == batch oracle restricted to the watermark window
    assert got == {(1, 2, 600_000_000), (5, 6, 1_800_000_000)}
    # the late pair (3, 4) — which the UNRESTRICTED batch join contains —
    # must be absent, and the engine must report the dropped inputs
    assert not any(v == 3 or p == 4 for (v, p, _) in got)
    assert dropped >= 2, f"expected both late rows dropped, metric={dropped}"


def test_stream_interval_join_matches_batch(spark):
    """Stream-stream interval join (two-sided stateful) drains to exactly
    the batch interval-join pairs, lag included; and the plan really is
    a streaming self-join of two watermarked sides."""
    from ncpi_whistler_spark.catalog import event_micros
    from ncpi_whistler_spark.streaming.windows import (
        view_purchase_interval_join_stream,
    )

    joined = view_purchase_interval_join_stream(spark, SF_DIR)
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("sij_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["view_id"], r["purchase_id"], r["lag_us"])
        for r in spark.table("sij_test").collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    v = ev.where("event_type = 'view'").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("v_ts")
    )
    p = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    lag = event_micros("p_ts") - event_micros("v_ts")
    batch = (
        v.join(p, (F.col("user_id") == F.col("p_user")) & (lag > 0) & (lag <= 3_600_000_000))
        .select("view_id", "purchase_id", lag.alias("lag_us"))
    )
    want = {(r["view_id"], r["purchase_id"], r["lag_us"]) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_interval_join_state_survives_restart(spark, tmp_path):
    """Stream-stream interval join across a FULL stop/restart boundary —
    the last stateful operator class without restart coverage. The
    view side of a pair arrives in batch 1, the query stops, and the
    matching purchase arrives in batch 2 after recovery from the same
    checkpoint: the join can only emit the pair if the view-side state
    store was restored. Pins exactly-once too — the in-batch-1 pair
    must not re-emit after the restart."""
    import pyspark.sql.functions as FF

    from ncpi_whistler_spark.streaming.recovery import (
        drain_batches_with_restart,
    )
    from ncpi_whistler_spark.streaming.windows import (
        view_purchase_interval_join,
    )

    def ev(rows):
        return spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, value double, ts string",
        ).withColumn("ts", FF.to_timestamp("ts"))

    batch1 = ev(
        [
            (1, 1, "view", 1.0, "2024-01-01 00:00:00"),
            (2, 1, "purchase", 1.0, "2024-01-01 00:10:00"),
            (4, 2, "view", 1.0, "2024-01-01 00:20:00"),
        ]
    )
    batch2 = ev(
        [
            (3, 1, "purchase", 1.0, "2024-01-01 00:30:00"),
            (5, 2, "purchase", 1.0, "2024-01-01 00:40:00"),
        ]
    )
    drained = drain_batches_with_restart(
        spark,
        [batch1, batch2],
        view_purchase_interval_join,
        str(tmp_path / "ij_restart"),
        output_mode="append",
    )
    got = sorted(
        (r["view_id"], r["purchase_id"], r["lag_us"]) for r in drained.collect()
    )
    # exactly once each: (1,2) in-batch, (1,3) and (4,5) SPAN the restart
    assert got == [
        (1, 2, 600_000_000),
        (1, 3, 1_800_000_000),
        (4, 5, 1_200_000_000),
    ]


def test_decode_state_tolerates_pre_nv_checkpoint_layout():
    """A checkpoint written before the nv (non-null counter) field was
    added decodes with nv defaulted to n — all historic events counted as
    non-null contributions (NULL events only became survivable in the
    same change that added nv, so a 2-field checkpoint never saw one)."""
    from ncpi_whistler_spark.streaming.stateful import _decode_state

    # pre-upgrade layout: (n, total)
    assert _decode_state((7, 12345.0), True) == (7, 12345, 7)
    assert _decode_state((7, 12.5), False) == (7, 12.5, 7)
    # current layout passes through, with the exact-cents int restore
    assert _decode_state((7, 12345.0, 5), True) == (7, 12345, 5)
    assert _decode_state((7, 12.5, 0), False) == (7, 12.5, 0)
