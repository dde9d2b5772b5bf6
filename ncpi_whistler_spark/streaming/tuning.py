"""Scale-adaptive shuffle/state partitioning for streaming queries.

``spark.sql.shuffle.partitions`` is the ONE Spark knob that sizes a
streaming query's stateful-operator partitioning — and it is pinned
into the checkpoint at first start (restarts silently keep the original
count), so it must be chosen deliberately per stream, not inherited
from whatever the session happens to run for batch work. Every state
partition costs real per-micro-batch overhead regardless of data: one
state-store instance, one delta/snapshot file write per commit, one
task per stage. A stream-stream join keeps FOUR stores per partition.

AQE coalesces small post-shuffle partitions for batch plans but does
NOT apply to streaming stateful exchanges, so a tiny feed on a
many-core session pays (cores × stores × commits) of pure overhead —
measured on this repo's fixtures: the q99 interval join dropped
5.8 s → 2.2 s going 32 → 8 partitions (round 7), and the round-12
sweep below reproduces the same shape on q85/q88/q107.

The adaptive rule sizes partitions from the SOURCE VOLUME the stream
is about to drain (the only size signal available before first start):
one partition per ``_TARGET_BYTES`` of input, clamped to the session's
``spark.sql.shuffle.partitions`` — so a production-scale feed keeps
the session/cluster parallelism (the helper never RAISES the count)
and only genuinely small replays shed pure-overhead partitions.
Deployments with known state size override via
``SPARK_GRAFT_STREAM_PARTITIONS`` (the usual capacity planning for
stateful streams) — the env var wins over the derivation.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

_ENV = "SPARK_GRAFT_STREAM_PARTITIONS"
_KEY = "spark.sql.shuffle.partitions"
#: source bytes per state partition. 32 MB of compressed source per
#: partition keeps per-task state far below executor-memory pressure at
#: scale while letting kilobyte-scale local replays run at 1-4
#: partitions instead of one per core.
_TARGET_BYTES = 32 << 20


def dir_bytes(path: str) -> int | None:
    """Total data bytes under ``path`` (None if unreadable/remote —
    callers fall back to the session value). Hidden/meta files skipped."""
    if not path or "://" in path:
        return None
    if os.path.isfile(path):
        try:
            return os.path.getsize(path)
        except OSError:
            return None
    total = 0
    try:
        for root, _, files in os.walk(path):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    except OSError:
        return None
    return total


def adaptive_stream_partitions(
    spark: SparkSession,
    src_bytes: int | None,
    floor: int = 1,
    target_bytes: int = _TARGET_BYTES,
) -> int:
    """Partition count for a NEW streaming checkpoint: env override,
    else ceil(src_bytes / target_bytes) clamped to [floor, session
    value]; unknown size → session value unchanged.

    ``target_bytes`` is the per-partition source volume at which the
    per-partition overhead (state-store instance + commit files + task)
    amortizes. JVM stateful operators (window aggs, stream-stream
    joins) amortize at ~32 MB; Python-side stateful operators
    (``applyInPandasWithState``) do ~two orders of magnitude more work
    per byte, so their balance point is far denser — pass a smaller
    target (the q88 sweep measured 256 KB/partition best: 32 parts
    3.8 s, 8 parts 3.3 s, 2 parts 3.8 s on a ~2 MB source)."""
    env = os.environ.get(_ENV)
    if env:
        return max(1, int(env))
    cur = int(spark.conf.get(_KEY, "200"))
    if src_bytes is None:
        return cur
    return max(floor, min(cur, math.ceil(src_bytes / target_bytes)))


@contextmanager
def stream_partitions(
    spark: SparkSession,
    src_bytes: int | None,
    floor: int = 1,
    target_bytes: int = _TARGET_BYTES,
):
    """Set ``spark.sql.shuffle.partitions`` for the stream started
    inside the block (the query snapshots session conf at ``start()``),
    restoring the session value on exit. Safe across restarts: Spark
    pins the count in the checkpoint, so later rounds of a shared
    checkpoint keep the first round's value regardless of what this
    recomputes."""
    prev = spark.conf.get(_KEY)
    spark.conf.set(
        _KEY,
        str(adaptive_stream_partitions(spark, src_bytes, floor, target_bytes)),
    )
    try:
        yield
    finally:
        spark.conf.set(_KEY, prev)
