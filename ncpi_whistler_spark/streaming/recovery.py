"""Checkpointed restart/recovery for streaming plans (§2.10 fault
tolerance; no reference analog — the reference is batch-only).

Streaming at scale is defined by what survives a crash: a query that
only works when one process drains everything in one run is a batch job
with extra steps. Recovery in Structured Streaming has three parts, and
this module exercises all of them as code, not documentation:

* **Offset/commit logs** under ``checkpointLocation`` — a restarted
  query resumes AFTER the last committed micro-batch (no source rows
  re-read, none skipped).
* **Operator state** — ``applyInPandasWithState`` / window state is
  rebuilt from the state store snapshot+delta files, so running
  accumulators continue from their pre-crash values.
* **Idempotent sink** — the memory sink used by drain-to-table tests
  does NOT support recovery (Spark refuses to restart from its
  checkpoint); the fault-tolerant pattern is ``foreachBatch`` writing
  each micro-batch to a ``batch=<batchId>`` parquet directory with
  overwrite semantics. A batch replayed after a crash (or a speculative
  task retry inside it) rewrites the SAME directory instead of
  appending duplicates — that is the exactly-once contract end to end.

The state-store backend is selectable (``hdfs`` in-memory default vs
``rocksdb``): at 100× state the default HDFS-backed provider keeps every
key in executor heap and is the first thing to fall over; RocksDB spills
to local disk with changelog checkpointing. One provider must be chosen
per checkpoint lifetime — the on-disk state formats differ.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ncpi_whistler_spark.session import STATE_STORE_PROVIDERS

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def drain_batches_with_restart(
    spark: SparkSession,
    batches: list[DataFrame],
    build_stream: Callable[[DataFrame], DataFrame],
    workdir: str,
    output_mode: str = "update",
    state_store: str | None = None,
    timeout: int = 300,
    partition_target_bytes: int | None = None,
) -> DataFrame:
    """Run a streaming plan over ``batches`` with a FULL STOP/RESTART
    boundary between every batch, recovering from one shared
    ``checkpointLocation`` each time; returns every emitted row tagged
    with its micro-batch id (partition column ``batch``).

    Per round: the next batch DataFrame is staged into the file-source
    directory, a NEW query object is started on it (``availableNow``),
    drained, and stopped. Restart round N therefore proves three things
    at once: round N-1's offsets are not re-read (exactly-once input),
    operator state carries across the restart (a stateful accumulator
    continues, not restarts), and the batchId-keyed ``foreachBatch``
    parquet sink stays duplicate-free under replay.

    ``state_store`` picks the backend for ALL rounds ("hdfs"/"rocksdb"
    or a full provider class name); it cannot change mid-checkpoint.
    The session's previous provider conf is restored afterwards.
    """
    src = os.path.join(workdir, "src")
    cp = os.path.join(workdir, "cp")
    out = os.path.join(workdir, "out")
    os.makedirs(src, exist_ok=True)
    schema = batches[0].schema

    def sink(mb: DataFrame, batch_id: int) -> None:
        # batchId-keyed overwrite = idempotent under batch replay; the
        # partition-style dirname makes the read-back expose `batch`.
        mb.write.mode("overwrite").parquet(os.path.join(out, f"batch={batch_id}"))

    prev_provider = spark.conf.get(_PROVIDER_KEY, None)
    if state_store is not None:
        spark.conf.set(
            _PROVIDER_KEY, STATE_STORE_PROVIDERS.get(state_store, state_store)
        )
    from ncpi_whistler_spark.streaming.tuning import dir_bytes, stream_partitions

    try:
        for batch in batches:
            # one file per staged batch keeps the restart boundary exactly
            # at the intended batch edge (file-source offsets are files)
            batch.coalesce(1).write.mode("append").parquet(src)
            # state partitioning sized from the staged source volume
            # (streaming/tuning.py) when the caller gives a per-partition
            # target; None leaves the session value untouched (the
            # right default for arbitrary build_stream plans). Round 1
            # pins the count into the checkpoint; Spark keeps it for
            # every restart round.
            with stream_partitions(
                spark,
                dir_bytes(src) if partition_target_bytes else None,
                target_bytes=partition_target_bytes or 1,
            ):
                q = (
                    build_stream(spark.readStream.schema(schema).parquet(src))
                    .writeStream.foreachBatch(sink)
                    .option("checkpointLocation", cp)
                    .outputMode(output_mode)
                    .trigger(availableNow=True)
                    .start()
                )
                if not q.awaitTermination(timeout):
                    q.stop()
                    raise TimeoutError(
                        f"streaming drain did not finish within {timeout} s"
                    )
                q.stop()  # full restart boundary: next round starts a NEW query
    finally:
        if state_store is not None:
            if prev_provider is None:
                spark.conf.unset(_PROVIDER_KEY)
            else:
                spark.conf.set(_PROVIDER_KEY, prev_provider)
    return spark.read.parquet(out)
