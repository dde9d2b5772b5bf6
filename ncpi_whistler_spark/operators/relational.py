"""Relational operators the reference lacks but the engine exposes
(SURVEY.md §2.3/§2.5 "not present" lists + W1/L1/O-ops).

Catalyst provides the physical strategies; these helpers encode the right
logical shapes so the optimizer can do its job: windowed top-k (not
global sorts), broadcast-range as-of joins, salted aggregations for skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """L1: row_number-capped rows per group (the reference's
    --max-validations cutoff, wstlr/load.py:93,332-339).

    Single shuffle on the partition keys; Spark's WindowGroupLimit pushes
    the k-limit into the sort so each partition keeps only k rows.
    Callers must make ``order_by`` total (include a unique tiebreaker) for
    deterministic results.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def sequential_codes(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    prefix_col: Column,
    out_col: str = "code",
    width: int = 6,
) -> DataFrame:
    """W1: deterministic sequential code generator — ``q000001, ...`` per
    prefix (reference's global counter, wstlr/dd/dd_from_fhir.py:17-21,
    199-202, made distributed-safe by deriving the sequence from an
    explicit total order instead of mutable driver state)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(
        out_col,
        F.format_string(f"%s%0{width}d", prefix_col, F.row_number().over(w)),
    )


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """EXISTS: rows of left with a match in right. Right side reduced to
    distinct keys first so it broadcasts whenever possible."""
    return left.join(right.select(*on).dropDuplicates(on), on=on, how="left_semi")


def anti_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    broadcast_right: bool = False,
) -> DataFrame:
    """NOT EXISTS: rows of left without a match in right (the reference's
    unresolved-reference miss-set, wstlr/load.py:264-286, is exactly this).

    broadcast_right=True ships the (deduped) exclusion set to every
    executor — a broadcast anti join runs map-side with zero shuffle of
    the probe side, the right plan whenever the exclusion list is
    dimension-sized."""
    keys = right.select(*on).dropDuplicates(on)
    if broadcast_right:
        keys = F.broadcast(keys)
    return left.join(keys, on=on, how="left_anti")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_time <= left_time (backward) / earliest >= (forward), per key.

    Implementation: union the two sides tagged with a side marker, one
    window sort per key carries the last-seen right payload to each left
    row — a single shuffle on the key, no range cross-product, scales to
    arbitrarily large both sides (the classic streaming-merge as-of plan).
    """
    lcols = left.columns
    rcols = [c for c in right.columns if c not in on and c != right_time]
    lt, rt = F.col(left_time), F.col(right_time)
    tagged_l = left.select(
        *on,
        lt.alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in rcols]).alias("s")).schema["s"].dataType.simpleString()
        ).alias("__r"),
    )
    tagged_r = right.select(
        *on,
        rt.alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("s")).schema["s"].dataType.simpleString()
        ).alias("__l"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
    )
    u = tagged_l.unionByName(tagged_r)
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = u.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1).select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        *[F.col("__match")[c].alias(c) for c in rcols],
    )
    return out


def salted_group_count(
    df: DataFrame, keys: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Two-phase (salted) count aggregation for skewed keys: phase 1
    aggregates (key, salt) partials, phase 2 merges per key. With AQE's
    skew handling this is rarely needed for counts (map-side combine
    already bounds skew), but it is the template for skew-sensitive
    aggregations at 100 TB."""
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__n"))
    return partial.groupBy(*keys).agg(F.sum("__n").alias("n"))


def bucketed_session_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
    gap_secs: int = 1800,
    bucket_secs: int = 86_400,
) -> DataFrame:
    """Sessionization counts (inactivity-gap sessions) without a
    per-user global window — the 100 TB rewrite of
    ``lag/cumsum OVER (PARTITION BY user)`` (SCALEBENCH_SKEW known
    limit: a zipfian hot user puts ~50% of rows in ONE task's sort,
    and AQE cannot split a running window partition).

    Two-level decomposition, the q55x overlap-padding idea applied to
    sessions:

    1. **Local pass** — rows shuffle on ``(user, ⌊t/bucket⌋)``, so the
       largest sort task is bounded by one user's events in one bucket
       regardless of total skew. Within a bucket, a session start is a
       row whose gap from the previous row exceeds ``gap_secs``
       (bucket-first rows are deferred to the merge).
    2. **Boundary merge** — per (user, bucket) summaries (one row per
       bucket: starts, min/max ts, count) go through a per-user window,
       but over *bucket summaries*, not events: a year of daily buckets
       is ≤366 rows even for a user with 10⁹ events. A bucket's first
       event starts a new session iff the previous non-empty bucket's
       last event is more than ``gap_secs`` away (or there is none).

    n_sessions = Σ local starts + Σ boundary starts, exactly the number
    of 1-marks the lag/cumsum form counts — test-pinned hash-equal.

    ``bucket_secs`` sizes the local task: pick it so one user's events
    per bucket fit an executor sort (default 1 day). ``order_cols``
    breaks ts ties deterministically in the local sort; gap decisions
    use ts alone, so results are tie-order invariant either way.
    """
    order_cols = order_cols or []
    t = F.unix_timestamp(F.col(ts_col))
    bucketed = df.select(
        F.col(user_col),
        F.col(ts_col),
        *[F.col(c) for c in order_cols],
        t.alias("__t"),
        (t - (t % F.lit(bucket_secs))).alias("__bkt"),
    )
    wlocal = Window.partitionBy(user_col, "__bkt").orderBy(ts_col, *order_cols)
    prev_t = F.lag("__t").over(wlocal)
    marked = bucketed.withColumn(
        "__start",
        (prev_t.isNotNull() & ((F.col("__t") - prev_t) > gap_secs)).cast("int"),
    )
    per_bucket = marked.groupBy(user_col, "__bkt").agg(
        F.sum("__start").alias("__local_starts"),
        F.min("__t").alias("__first_t"),
        F.max("__t").alias("__last_t"),
        F.count(F.lit(1)).alias("__n"),
    )
    wb = Window.partitionBy(user_col).orderBy("__bkt")
    prev_last = F.lag("__last_t").over(wb)
    merged = per_bucket.withColumn(
        "__boundary",
        F.when(
            prev_last.isNull() | ((F.col("__first_t") - prev_last) > gap_secs),
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    return merged.groupBy(user_col).agg(
        F.sum(F.col("__local_starts") + F.col("__boundary")).alias("n_sessions"),
        F.sum("__n").alias("n_events"),
    )


def trailing_range_agg(
    df: DataFrame,
    id_cols: list[str],
    partition_cols: list[str],
    ts_micros: Column,
    window_micros: int,
    value_cols: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Trailing time-RANGE aggregation via overlap-padded time bucketing —
    the 100 TB rewrite of ``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW``
    window frames (SCALING.md known-limits item, now implemented).

    A window function partitions by ``partition_cols`` alone, so one
    low-cardinality key = one executor-sized sort forever. Here each row
    gets a time bucket ``⌊t/w⌋``; probe rows are duplicated into their own
    bucket AND the next (a row can only contribute to targets in those
    two), the join runs on (partition, bucket) — time-sliced parallelism
    regardless of key cardinality — and the frame membership filter
    ``t - w ≤ t' ≤ t`` (inclusive both ends, matching SQL RANGE) selects
    the exact window before aggregation. Cost: Σ window sizes, the same
    work the window operator does, minus the serial per-key sort.

    ``aggs`` reference probe-side values as ``F.col("w_<name>")``; each
    target row always matches itself, so no empty groups.

    Output: id_cols + partition_cols + one column per aggs key.
    Test-proven equal to the window-function form (test_operators).
    """
    te = ts_micros.alias("__te")
    bucket = (F.col("__te") - (F.col("__te") % F.lit(window_micros))).alias("__bkt")
    left = df.select(*id_cols, *partition_cols, te).select("*", bucket)
    probe = (
        df.select(*partition_cols, te, *[F.col(c).alias(f"w_{c}") for c in value_cols])
        .select(
            "*",
            F.explode(
                F.array(
                    (F.col("__te") - (F.col("__te") % F.lit(window_micros))),
                    (F.col("__te") - (F.col("__te") % F.lit(window_micros)))
                    + F.lit(window_micros),
                )
            ).alias("__bkt"),
        )
        .withColumnRenamed("__te", "__wte")
    )
    joined = left.join(probe, on=[*partition_cols, "__bkt"]).where(
        (F.col("__wte") >= F.col("__te") - F.lit(window_micros))
        & (F.col("__wte") <= F.col("__te"))
    )
    return (
        joined.groupBy(*id_cols, *partition_cols, "__te")
        .agg(*[a.alias(name) for name, a in aggs.items()])
        .drop("__te")
    )
