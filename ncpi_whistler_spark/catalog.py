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


class CorruptTableError(RuntimeError):
    """A table directory contains files whose parquet footer cannot be
    read (truncated/garbled) — raised by :func:`verify_table_files` with
    every bad file named."""


class SchemaDriftError(RuntimeError):
    """A table directory mixes files with differing schemas — raised by
    :func:`verify_table_files` naming the drifted file(s) and fields.
    Deliberately NOT maskable by ``ignore_corrupt_files``: a drifted file
    is valid parquet, and silently reading it with the majority schema
    would null-fill or mistype columns instead of failing."""


def _table_part_files(sf_dir: str, name: str) -> list[str]:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        return [path]
    out: list[str] = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            # Spark directory layout: data is *.parquet; _SUCCESS /
            # .crc / _metadata sidecars are not data files
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return out


def verify_table_files(sf_dir: str, name: str) -> dict:
    """Pre-flight footer scan of every data file in a table — the engine's
    CORRUPT-FILE POLICY, made explicit:

    * default engine stance is FAIL LOUD: a truncated/garbled file
      raises :class:`CorruptTableError` naming every bad file (Spark's
      own scan-time error also fails the job, but surfaces one file at a
      time from deep inside an executor stack);
    * a file whose (name, type) column signature differs from the rest
      raises :class:`SchemaDriftError` naming the file and the differing
      fields — this class of corruption is NEVER skippable, because the
      file parses fine and would silently null-fill under a merged or
      majority schema;
    * a clean table returns ``{"files": N, "rows": total}``.

    Cost is one footer read per file (no data pages), so it is a cheap
    pre-flight at fixture scale; at 100 TB / millions of files run it
    selectively (new partitions since the last verified watermark) — which
    is why it is an explicit call rather than buried inside every
    ``load_table``.
    """
    import pyarrow.parquet as pq

    files = _table_part_files(sf_dir, name)
    corrupt: list[tuple[str, str]] = []
    sigs: dict[tuple, list[str]] = {}
    rows = 0
    for f in files:
        try:
            meta = pq.read_metadata(f)
            sig = tuple(
                (fld.name, str(fld.type)) for fld in pq.read_schema(f)
            )
        except Exception as exc:  # pyarrow raises ArrowInvalid/OSError
            corrupt.append((f, str(exc).splitlines()[0]))
            continue
        rows += meta.num_rows
        sigs.setdefault(sig, []).append(f)
    if corrupt:
        named = "; ".join(f"{f!r}: {err}" for f, err in corrupt)
        raise CorruptTableError(
            f"table {name!r} under {sf_dir!r} has {len(corrupt)} corrupt "
            f"parquet file(s): {named}. Engine policy is fail-loud; pass "
            f"ignore_corrupt_files=True to load_table to skip them "
            f"(documented degraded mode)."
        )
    if len(sigs) > 1:
        # majority schema = the signature backing the most files
        major = max(sigs.items(), key=lambda kv: len(kv[1]))[0]
        drifted = {
            fs[0]: sorted(set(sig) ^ set(major))
            for sig, fs in sigs.items()
            if sig != major
        }
        named = "; ".join(
            f"{f!r} differs on {diff}" for f, diff in drifted.items()
        )
        raise SchemaDriftError(
            f"table {name!r} under {sf_dir!r} mixes {len(sigs)} schemas: "
            f"{named}. Schema drift is never skippable — fix or quarantine "
            f"the drifted file(s)."
        )
    return {"files": len(files), "rows": rows}


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
_TABLE_CACHE: dict[tuple[str, str, str, bool], DataFrame] = {}
#: Queries share one session across threads (a normal multi-tenant Spark
#: pattern); the cache's eviction sweep iterates the dict, so without a
#: lock a concurrent first-load insert raises "dictionary changed size
#: during iteration". The guarded section is config-scale (dict ops +
#: at most one schema-inference read), never data-scale.
_TABLE_CACHE_LOCK = threading.Lock()


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ignore_corrupt_files: bool = False,
) -> DataFrame:
    """Load one fixture table (memoized per session; thread-safe).

    ``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it as a nanos
    long (legacy conf) and we floor-divide to micros — identical to how
    micro-resolution engines (DuckDB included) truncate nanos.

    Corrupt-file policy: by default a truncated/garbled data file FAILS
    the job loudly (Spark's scan error names the file; run
    :func:`verify_table_files` for a pre-flight that names them all).
    ``ignore_corrupt_files=True`` is the documented degraded mode — the
    per-source ``ignoreCorruptFiles`` reader option skips unreadable
    files and returns the healthy remainder (use for salvage reads, never
    in the correctness-checked pipelines; schema DRIFT is a different
    corruption class and is never skippable — see
    :class:`SchemaDriftError`).
    """
    _ensure_runtime_conf(spark)
    app_id = spark.sparkContext.applicationId
    key = (app_id, os.path.abspath(sf_dir), name, ignore_corrupt_files)
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
    reader = spark.read
    if ignore_corrupt_files:
        reader = reader.option("ignoreCorruptFiles", "true")
    df = reader.parquet(os.path.join(sf_dir, f"{name}.parquet"))
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
