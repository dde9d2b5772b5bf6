"""Streaming windowed aggregations over the events table.

The reference is pure batch (SURVEY.md §2.10) — this module is the
capability extension: tumbling-window counts with a watermark for late
data, and session windows (the streaming twins of batch queries
q18_events_hourly / q19_sessionize, which share the same grouping
semantics so results are cross-checkable).

File-based streams replay the same parquet fixtures via ``readStream``
with ``availableNow`` in tests; in production the source swaps for
Kafka/Kinesis without touching the aggregation plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet-directory stream of the events table (schema pinned from a
    batch read; nanos ts converted exactly like the batch catalog)."""
    from ncpi_whistler_spark.catalog import ensure_event_time

    import os

    path = f"{sf_dir}/events.parquet"
    # ONE schema derivation (footer read). r13: the old code ALSO built
    # the batch catalog frame just to hold it (`_ = batch`) — a second
    # schema-inference pass per stream construction, pure overhead in
    # the per-query lifecycle profile.
    raw_schema = spark.read.parquet(path).schema
    # File streams need a directory source. Two fixture layouts exist:
    # the driver's single FILE named events.parquet (stream the parent
    # dir with a filename glob) and the engine-written DIRECTORY of
    # part files (stream the directory itself — the only layout that
    # exists at cluster scale; the glob would match zero part files and
    # silently stream nothing, found by the sf1 bench). Paths with a
    # scheme (hdfs://, s3a://) are always directory layouts.
    if "://" in sf_dir or os.path.isdir(path):
        stream = spark.readStream.schema(raw_schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    # Watermarks require TIMESTAMP; normalize bigint-nanos / TIMESTAMP_NTZ.
    return ensure_event_time(stream, "ts")


#: Canonical events record schema — the contract every streaming source
#: adapter must produce, and the only thing the window/dedup/enrich plans
#: depend on. DDL form so it doubles as a from_json schema.
EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Kafka-record-shaped stream (binary ``key``/``value`` + topic
    metadata, the schema `spark.readStream.format("kafka")` emits) →
    canonical events records: JSON-decode ``value`` against EVENTS_DDL.

    Shared by the real Kafka branch of :func:`read_events_stream_config`
    and by tests that replay a kafka-shaped file stream — which is what
    makes the source swap *executable* evidence rather than a comment:
    the downstream window/dedup/enrich plans consume only this function's
    output schema, never the source."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), EVENTS_DDL).alias("e")
    ).select("e.*")


def read_events_stream_config(spark: SparkSession, conf: dict) -> DataFrame:
    """Config-driven source selector: the production entry point where the
    event source is deployment config, not code.

    ``{"source": "file", "sf_dir": ...}`` replays the parquet fixtures
    (tests / backfill); ``{"source": "kafka", "bootstrap_servers": ...,
    "topic": ...}`` builds the standard Kafka reader (requires the
    spark-sql-kafka connector on the classpath) and decodes records with
    :func:`parse_kafka_events`. Both branches return the SAME canonical
    schema (EVENTS_DDL), so every downstream plan in this module is
    source-agnostic by construction."""
    source = conf.get("source", "file")
    if source == "file":
        return read_events_stream(spark, conf["sf_dir"])
    if source == "kafka":
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", conf["bootstrap_servers"])
            .option("subscribe", conf["topic"])
            .option("startingOffsets", conf.get("starting_offsets", "earliest"))
            .load()
        )
        return parse_kafka_events(raw)
    raise ValueError(
        f"unknown stream source {source!r}; expected 'file' or 'kafka'"
    )


def hourly_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour counts per event_type with late-data watermark —
    the streaming twin of q18 (same window grain)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap — the
    streaming twin of q19's lag/cumsum sessionization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame, keys: list[str], watermark: str = "2 hours", ts_col: str = "ts"
) -> DataFrame:
    """Streaming exact dedup: drop duplicate keys arriving within the
    watermark horizon (state is bounded by the watermark — the streaming
    twin of the batch dropDuplicates dedup A5)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, timeout_sec: int = 120
) -> None:
    """Drain a stream with availableNow into an in-memory table (tests /
    local verification); blocks until the replay completes."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout WITHOUT raising — a
    # silent partial drain would hand callers a half-filled memory table
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"stream drain '{query_name}' did not finish in {timeout_sec}s"
        )


def enriched_stream(
    events: DataFrame,
    dim: DataFrame,
    on_left: str = "user_id",
    on_right: str = "c_custkey",
    cols: list[str] | None = None,
) -> DataFrame:
    """Stream-static enrichment join — the streaming twin of the
    dim/harmonize broadcast lookups (J3): the static side is re-read per
    micro-batch and broadcast, so the stream side never shuffles and the
    operator holds NO state (no watermark needed; works in append mode).
    At scale this is how a 100 TB/day event stream picks up
    slowly-changing dimensions without restarting the query."""
    cols = cols or ["c_mktsegment"]
    lookup = dim.select(F.col(on_right).alias(on_left), *cols)
    return events.join(F.broadcast(lookup), on=on_left, how="left")


def view_purchase_interval_join_stream(
    spark: SparkSession,
    sf_dir: str,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM interval join over the fixture events stream — see
    :func:`view_purchase_interval_join` for the join semantics (this
    wrapper only supplies the file source).

    Append-mode semantics note: with the fixture's single parquet file
    the availableNow drain is one micro-batch, so the final watermark
    never drops a fixture row and the drained rows equal the batch
    join row-for-row (the q85 precedent, join-shaped). The multi-batch
    failure mode — late rows arriving after the watermark has advanced —
    is exercised separately: test_streaming's watermark test drives
    :func:`view_purchase_interval_join` across two explicit
    micro-batches (files written between two processAllAvailable()
    drains, out of order) and pins both the on-time results and the
    late-row drops.
    """
    return view_purchase_interval_join(
        read_events_stream(spark, sf_dir), max_lag, watermark
    )


def view_purchase_interval_join(
    stream: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM interval join: each purchase joined to every view by
    the same user within ``(view_ts, view_ts + max_lag]`` — the
    attribution-join shape, as a true two-sided stateful stream join
    (both sides watermarked; Spark bounds the join state by the
    watermark + interval condition, so state is O(events within the lag
    window), not O(stream)).

    Both sides are filters of ONE events-schema stream (stream
    self-joins are supported); in production each side swaps for its own
    Kafka topic via read_events_stream_config without touching the join.
    The lag is emitted in integer microseconds (unix_micros) so the
    drained result value-hashes against the batch interval-join oracle
    exactly. Input rows older than the current watermark are dropped by
    the engine (the documented streaming contract — pinned by the
    multi-batch watermark test, not a parity bug).
    """
    views = (
        stream.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purch_ts"),
        )
        .withWatermark("purch_ts", watermark)
    )
    joined = views.join(
        purchases,
        F.expr(
            f"user_id = p_user_id AND purch_ts > view_ts "
            f"AND purch_ts <= view_ts + interval {max_lag}"
        ),
    )
    return joined.select(
        "view_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("purch_ts") - F.unix_micros("view_ts")).alias("lag_us"),
    )
