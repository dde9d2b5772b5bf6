"""Scale-adaptive input spreading for Arrow-UDF-heavy batch operators.

The vector operators (IVF assignment, hyperplane bucketing, pair
scoring) run their per-row work through Arrow/pandas UDFs, so their
parallelism is bounded by the INPUT partition count — and a small
parquet fixture (or any recently-compacted table) arrives as one scan
partition, serializing the whole Python-side pipeline onto one core
while the rest of the session idles (measured: q89 semantic dedup at
sf0.1 runs its entire assign+probe pipeline as ONE 0.9 s task on a
32-core session; spreading the 1 MB input to 8 partitions cut the
query 2.6 s → 1.6 s isolated min-of-3).

The rule mirrors ``streaming/tuning.adaptive_stream_partitions``: one
partition per ``target_bytes`` of on-disk input, clamped to the
session's default parallelism — the helper never RAISES the partition
count above what the cluster runs anyway, and it only repartitions
when the CURRENT scan layout is estimated to have fewer partitions
than that target, so a production-scale input (whose scan already
splits into >= parallelism partitions) passes through untouched with
no extra shuffle. Python-side vector work does ~two orders of
magnitude more per-byte work than a JVM scan, so the balance point is
far denser than the 128 MB scan default — 128 KB per partition
(measured sweep on the q89 fixture: 1 partition 2.6 s, 8 partitions
[128 KB each] 1.6 s, 32 partitions 2.3 s — past the knee the per-task
Arrow/worker fixed cost dominates). ``SPARK_GRAFT_SPREAD_PARTITIONS``
overrides the derivation for deployments that size vector work
explicitly.
"""

from __future__ import annotations

import math
import os
import re

from pyspark.sql import DataFrame

_ENV = "SPARK_GRAFT_SPREAD_PARTITIONS"
#: on-disk bytes per partition of Python-side vector work (see module
#: docstring for the measured sweep behind the value)
VECTOR_TARGET_BYTES = 128 << 10
#: on-disk bytes per partition of heavy JVM map-side work (exact
#: percentile buffers, wide pre-join projections): per-byte cost is
#: roughly an order of magnitude below the Python boundary, so the
#: balance point is correspondingly coarser (measured on the q36 exact
#: percentile at sf0.1: 1 scan partition 2.9 s, ~8×1.35 MB partitions
#: 1.09 s, 32 partitions 1.29 s)
JVM_TARGET_BYTES = 1 << 20

_SIZE_RE = re.compile(r"^(\d+)\s*([kmgt]?)b?$", re.IGNORECASE)
_SIZE_MULT = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(v: str, default: int) -> int:
    m = _SIZE_RE.match(v.strip())
    if not m:
        return default
    return int(m.group(1)) * _SIZE_MULT[m.group(2).lower()]


def materialize_shared(df: DataFrame) -> DataFrame:
    """Materialization BARRIER for a frame consumed by multiple
    concurrent plan subtrees (self-join sides, broadcast builds, fan-out
    aggregations). A lazy ``persist()`` is NOT a barrier: AQE submits
    independent consumer subtrees' stage jobs concurrently, and a job
    does not wait on another job's in-flight cache partitions — on a
    cold cache each consumer can re-execute the full upstream pipeline.
    Measured r13 (per-rep-cold, UI job profiles): q94's shared window
    frame re-ran its exchange+sort 14× under the lazy persist (467
    tasks vs 155 with the barrier); q24/q79's shingle table showed the
    same multi-x materialization on every cold rep. The eager
    ``localCheckpoint`` computes the frame exactly once, up front, and
    every consumer scans the checkpointed blocks; it also truncates the
    lineage, which keeps the 5-10-consumer plans small.

    Mode-aware durability: local checkpoint blocks are executor-local —
    a LOST EXECUTOR cannot recompute them and the whole query dies
    (caught by tools/faultinject --mode cluster when this helper first
    shipped as unconditional localCheckpoint: the SIGKILLed executor's
    shingle blocks were gone and recovery failed). On a single-JVM
    ``local[N]`` master there is no executor to lose, so the checkpoint
    is safe and fastest; on ANY multi-JVM master (local-cluster,
    standalone, YARN, K8s) the barrier is ``persist()`` + an eager
    ``count()`` — the same materialize-once semantics with lineage
    RETAINED, so executor loss recomputes lost cache partitions
    instead of failing the query. The barrier runs at plan-BUILD time,
    so callers that only want the lazy plan pay the materialization —
    every current caller executes the frame anyway.
    ``SPARK_GRAFT_SHARED_MODE=persist`` restores the r12 lazy cache
    (the A/B hook used to measure this; not a tuning knob)."""
    if os.environ.get("SPARK_GRAFT_SHARED_MODE") == "persist":
        return df.persist()
    if _single_jvm_master(df.sparkSession.sparkContext.master or ""):
        return df.localCheckpoint(eager=True)
    out = df.persist()
    out.count()
    return out


def _single_jvm_master(master: str) -> bool:
    """True only for single-JVM local masters (local / local[N] /
    local[N,F] / local[*]) where an executor can never be lost. NOT
    true for local-cluster[...] (multi-JVM: real executor loss, used
    by the fault-injection suite) or any cluster manager URL."""
    return re.fullmatch(r"local(\[[^\]]*\])?", master) is not None


def spread_small_input(
    df: DataFrame, target_bytes: int = VECTOR_TARGET_BYTES
) -> DataFrame:
    """Round-robin-repartition ``df`` up to ceil(bytes/target_bytes)
    partitions (clamped to the session parallelism) when its file-scan
    layout is estimated to provide fewer — a no-op whenever the input
    is remote, non-file-backed, or already wide enough. Row values are
    untouched; only placement changes (keyless repartition is
    deterministic under retry via Spark's sort-before-repartition)."""
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    total = 0
    for f in files:
        p = f
        if p.startswith("file:"):
            p = re.sub(r"^file:/{0,2}(/)", r"\1", p)
        if "://" in p:
            return df  # remote store: no cheap size signal, don't guess
        try:
            total += os.path.getsize(p)
        except OSError:
            return df
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    env = os.environ.get(_ENV)
    if env:
        target = max(1, int(env))
    else:
        target = max(1, min(par, math.ceil(total / target_bytes)))
    # estimated scan partitions: each file opens at least one partition,
    # and big files split at maxPartitionBytes — if that layout already
    # meets the target, adding a repartition would be a pure extra
    # shuffle (the production regime: many/large files)
    mpb = _parse_bytes(
        str(spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")),
        128 << 20,
    )
    est_cur = max(len(files), math.ceil(total / mpb))
    if est_cur >= target:
        return df
    return df.repartition(target)
