"""Streaming CDC apply: a change-log stream continuously merged into a
queryable base table, with exactly-once EFFECT under crash/replay.

Extends the batch merge (operators/cdc.py) to Structured Streaming via
``foreachBatch``. Two pieces make it crash-safe end to end:

* **VersionedTable** — the table directory holds immutable,
  NEVER-REUSED version subdirectories (``v=<batchId>-<token>``) plus a
  ``_CURRENT`` pointer file; readers resolve the pointer, writers
  publish a fresh directory and then move the pointer with an atomic
  ``os.replace``. A crash mid-publish leaves the previous version live
  (the half-written directory is an unreferenced orphan); a replayed
  batch publishes a NEW directory for the same version id and
  re-points. Directory names are never reused because a replayed batch
  READS the current version while merging — overwriting the directory
  it is reading from is exactly the torn-write Spark's FileFormatWriter
  aborts on (the first version of this module did that, and the replay
  test caught it). Superseded/orphan directories are reclaimed by
  ``vacuum(keep=...)``, which must retain enough versions for in-flight
  readers. (This is the local-FS stand-in for a transactional table
  format's commit; on a real deployment the publish step is a Delta/
  Iceberg transaction and everything else here is unchanged.)

* **Idempotent merge** — the sink recomputes
  ``merge_upsert(current_base, batch_delta)`` per micro-batch. Because
  the merge is latest-wins (argmax on ``seq_col``), replaying a batch
  against a base that ALREADY absorbed it is a fixpoint: updates
  replace rows with identical values, deletes find nothing, inserts
  re-insert identical rows. So wherever the crash lands relative to the
  checkpoint commit — before the publish, between publish and offset
  commit, or mid-write — the restarted query converges to the same
  bytes (test-pinned, including a deliberate double-apply).

Ordering contract: the published base does NOT retain ``seq_col``, so
incremental application is equivalent to one global merge only when the
feed delivers each key's changes in non-decreasing ``seq_col`` order
ACROSS batches — the natural property of a CDC log (within one batch,
order is irrelevant: the compaction is an argmax). Replaying the SAME
batch is always safe (fixpoint); REORDERING batches is not, and a feed
that can reorder must carry seq into the base schema instead.

Scale notes: the per-batch plan is exactly the batch merge's —
compaction shuffle ~|batch keys|, broadcast anti join (a micro-batch is
always dimension-sized vs the base), base scanned once. The full-base
rewrite per batch is the LOCAL simplification: at 100 TB the base is
partitioned (e.g. by key bucket) and the rewrite touches only the
partitions that contain changed keys (prune with the compacted delta's
distinct buckets — the same broadcast), or the publish becomes a
merge-on-read delta commit. The reference has no streaming or
incremental path at all (wstlr/play.py is batch re-extract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ncpi_whistler_spark.operators.cdc import merge_upsert


class VersionedTable:
    """Immutable, never-reused version directories + an atomically-
    swapped pointer file (format: ``<version>\\n<dirname>``).

    SINGLE-WRITER contract: ``publish`` is read-modify-write on the
    pointer with no compare-and-swap, so exactly one writer (one
    streaming query / one batch job) may publish at a time — the same
    contract a Structured Streaming checkpoint already enforces for the
    streaming path. Two independent feeds into one table need a real
    transactional table format (Delta/Iceberg optimistic commit), not
    this local stand-in. Readers are unrestricted: they resolve the
    pointer once and then hold an immutable directory (snapshot
    isolation for the lifetime of their scan, bounded by vacuum
    retention)."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def _read_pointer(self) -> tuple[int, str] | None:
        try:
            with open(self._pointer) as fh:
                version_line, dirname = fh.read().splitlines()[:2]
            target = os.path.join(self.path, dirname)
            if not os.path.isdir(target):
                return None
            return int(version_line), dirname
        except (OSError, ValueError):
            return None

    def current_version(self) -> int | None:
        ptr = self._read_pointer()
        return ptr[0] if ptr else None

    def current_dir(self) -> str | None:
        ptr = self._read_pointer()
        return os.path.join(self.path, ptr[1]) if ptr else None

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        """Read the current version, or — time travel — a specific
        retained ``version`` (None if that version was never published
        or was vacuumed). With multiple publishes of one version id
        (batch replays), the most recently written directory wins."""
        if version is None:
            d = self.current_dir()
            return None if d is None else spark.read.parquet(d)
        prefix = f"v={version}-"
        cands = [
            os.path.join(self.path, n)
            for n in os.listdir(self.path)
            if n.startswith(prefix)
        ]
        if not cands:
            return None
        return spark.read.parquet(max(cands, key=os.path.getmtime))

    def versions(self) -> list[int]:
        """Retained (readable) version ids, ascending."""
        out = set()
        for n in os.listdir(self.path):
            if n.startswith("v="):
                try:
                    # dirname = v=<version>-<token>; version may be
                    # negative (bootstrap), so strip the token from the
                    # RIGHT
                    out.add(int(n[2:].rsplit("-", 1)[0]))
                except ValueError:
                    continue
        return sorted(out)

    def publish(self, df: DataFrame, version: int) -> str:
        """Write ``df`` into a FRESH directory for ``version`` and
        atomically re-point. Never writes into an existing directory —
        a replayed batch's merge plan is still lazily READING the
        current version while this write runs."""
        import uuid

        dirname = f"v={version}-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, dirname))
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(f"{version}\n{dirname}\n")
        os.replace(tmp, self._pointer)  # atomic on POSIX
        return dirname

    def vacuum(self, keep: int = 2) -> list[str]:
        """Best-effort removal of unreferenced version directories,
        keeping the current one plus the ``keep``-1 most recently
        modified others (in-flight readers hold directory listings, so
        retention must cover the longest concurrent read)."""
        import shutil

        ptr = self._read_pointer()
        live = {ptr[1]} if ptr else set()
        candidates = sorted(
            (
                d
                for d in os.listdir(self.path)
                if d.startswith("v=") and d not in live
            ),
            key=lambda d: os.path.getmtime(os.path.join(self.path, d)),
            reverse=True,
        )
        removed = []
        for d in candidates[max(keep - 1, 0):]:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
            removed.append(d)
        return removed


def cdc_merge_sink(
    spark: SparkSession,
    table: VersionedTable,
    keys: list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
):
    """foreachBatch callable: merge each micro-batch of the change log
    into ``table``. The batch delta is always broadcast (a micro-batch
    is dimension-sized vs the base by construction)."""

    def sink(mb: DataFrame, batch_id: int) -> None:
        base = table.read(spark)
        if base is None:
            drop = {seq_col} | ({op_col} if op_col else set())
            base_cols = [c for c in mb.columns if c not in drop]
            base = mb.select(*base_cols).where(F.lit(False))
        merged = merge_upsert(
            base,
            mb,
            keys=keys,
            seq_col=seq_col,
            op_col=op_col,
            delete_op=delete_op,
            broadcast_delta=True,
        )
        table.publish(merged, int(batch_id))

    return sink


def run_cdc_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    table_path: str,
    keys: list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
    checkpoint: str | None = None,
    timeout: int = 300,
) -> VersionedTable:
    """Drain the change-log files currently in ``source_dir`` into the
    versioned table at ``table_path`` (``availableNow`` trigger — call
    again after staging more files; the shared checkpoint guarantees no
    batch is re-read and any half-applied batch is replayed, which the
    idempotent merge absorbs)."""
    table = VersionedTable(table_path)
    cp = checkpoint or os.path.join(table_path, "_checkpoint")
    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(
            cdc_merge_sink(spark, table, keys, seq_col, op_col, delete_op)
        )
        .option("checkpointLocation", cp)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(f"CDC stream did not drain within {timeout} s")
    q.stop()
    return table
