"""Parquet table catalog for the driver-provided test fixtures.

Loads the TPC-H-ish star schema + events/documents/embeddings tables
(TESTDATA.md) with schema fix-ups so downstream operators see clean types.
At 100 TB these reads become partitioned-table scans; everything here is a
plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown, column
pruning and partition pruning.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_runtime_conf(spark: SparkSession) -> None:
    # Runtime-settable; required even when the session was built elsewhere
    # (the verification driver passes its own session).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def ensure_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (session tz) — the only
    type watermarks and ``unix_micros`` accept on PySpark 4.x.

    Handles every shape the fixtures have surfaced: parquet TIMESTAMP(NANOS)
    read as a nanos long (legacy conf), and plain TIMESTAMP_NTZ. Batch
    ``load_table`` intentionally keeps NTZ (it matches DuckDB's naive
    timestamps value-for-value in the driver compare); call this at the
    points that *require* TIMESTAMP: streaming watermarks and
    unix_micros-style consumers.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def event_micros(col) -> "F.Column":
    """Microseconds-since-epoch of an event-time column.

    THE one place the batch NTZ policy meets ``unix_micros``: batch
    ``load_table`` keeps TIMESTAMP_NTZ for DuckDB value-parity (see
    ``ensure_event_time``), but ``unix_micros`` only accepts TIMESTAMP,
    so every epoch-arithmetic consumer funnels through this cast (the
    session tz is pinned UTC, so the NTZ→TIMESTAMP mapping is linear and
    lossless). Accepts a column name or Column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


#: (applicationId, sf_dir, table) → DataFrame. DataFrames are immutable
#: logical plans, so sharing one per table is safe; keying by
#: applicationId means a new session never sees a stale plan. Avoids the
#: per-query file-listing + schema-inference job (85 registry queries ×
#: ~1.5 tables would otherwise re-run it every time).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}
#: Queries share one session across threads (a normal multi-tenant Spark
#: pattern); the cache's eviction sweep iterates the dict, so without a
#: lock a concurrent first-load insert raises "dictionary changed size
#: during iteration". The guarded section is config-scale (dict ops +
#: at most one schema-inference read), never data-scale.
_TABLE_CACHE_LOCK = threading.Lock()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (memoized per session; thread-safe).

    ``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it as a nanos
    long (legacy conf) and we floor-divide to micros — identical to how
    micro-resolution engines (DuckDB included) truncate nanos.
    """
    _ensure_runtime_conf(spark)
    app_id = spark.sparkContext.applicationId
    key = (app_id, os.path.abspath(sf_dir), name)
    with _TABLE_CACHE_LOCK:
        # Evict entries from other (stopped) sessions so dead DataFrames
        # and their SparkSessions don't pin memory for the process
        # lifetime.
        stale = [k for k in _TABLE_CACHE if k[0] != app_id]
        for k in stale:
            del _TABLE_CACHE[k]
        cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    # Read OUTSIDE the lock: file listing + schema inference can take
    # seconds on object storage, and holding the lock would serialize
    # first loads of unrelated tables (and block every cache hit behind
    # them). Two threads may race the same first load; setdefault keeps
    # one plan and the loser's duplicate is discarded — DataFrames are
    # immutable, so either is correct.
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    with _TABLE_CACHE_LOCK:
        return _TABLE_CACHE.setdefault(key, df)


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load several tables as a dict — the engine's 'dataset' abstraction.

    Mirrors the reference's whistle-input dataset (one JSON document with a
    key per table, wstlr/extractor.py:207-224) as a catalog of lazy
    DataFrames: nothing is read until an action runs, so inactive tables
    cost nothing (the reference's active_tables pruning,
    wstlr/extractor.py:299, falls out of lazy evaluation for free).
    """
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
