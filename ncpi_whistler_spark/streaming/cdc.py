"""Streaming CDC apply: a change-log stream continuously merged into a
queryable base table, with exactly-once EFFECT under crash/replay and a
partition-pruned incremental publish that rewrites only the buckets a
micro-batch actually touched.

Extends the batch merge (operators/cdc.py) to Structured Streaming via
``foreachBatch``. Three pieces make it crash-safe end to end:

* **VersionedTable** — the table directory holds immutable,
  NEVER-REUSED version subdirectories (``v=<batchId>-<pubseq>-<token>``)
  plus a ``_CURRENT`` pointer file; readers resolve the pointer, writers
  publish a fresh directory and then move the pointer with an atomic
  ``os.replace``. A version directory is COMMITTED only once it contains
  a ``_COMMITTED`` marker, written after every file (including
  carried-over bucket links) is in place and before the pointer moves —
  ``versions()``/``read(version=)`` ignore uncommitted directories, so a
  crash mid-publish can never serve torn data (Spark's own ``_SUCCESS``
  is NOT sufficient: an incremental publish links carry-over buckets in
  AFTER Spark's write commits). A replayed batch publishes a NEW
  directory for the same version id and re-points; with multiple
  publishes of one id the highest publish sequence wins
  (deterministic — no mtime races). Superseded/orphan directories are
  reclaimed by ``vacuum(keep=...)``; hard-linked carry-over files make
  that safe (removing an old version never breaks a newer one that
  links its files). (This is the local-FS stand-in for a transactional
  table format's commit; on a real deployment the publish step is a
  Delta/Iceberg transaction and everything else here is unchanged.)

* **Bucketed incremental publish** — with ``bucket_cols``/
  ``num_buckets`` set, every version directory is laid out as
  ``__bucket=<pmod(hash(keys), N)>/`` partitions. The sink compacts the
  micro-batch, collects its DISTINCT buckets (delta-sized — the same
  rows it broadcasts), reads ONLY those buckets of the base (partition
  pruning on the ``__bucket`` partition column), merges, writes only
  those buckets into the new version, and HARD-LINKS every untouched
  bucket's files from the previous version. Per-batch I/O is therefore
  O(changed buckets) ≈ O(delta), not O(base) — the 100 TB shape. At
  cluster scale the hard-link step is a manifest/metadata commit
  (Delta/Iceberg keep unchanged files by reference); the bucket-pruned
  read-merge-write is identical.

* **Idempotent merge** — the sink recomputes
  ``merge_upsert(current_base, batch_delta)`` per micro-batch. Because
  the merge is latest-wins (argmax on ``seq_col``), replaying a batch
  against a base that ALREADY absorbed it is a fixpoint: updates
  replace rows with identical values, deletes find nothing, inserts
  re-insert identical rows. So wherever the crash lands relative to the
  checkpoint commit — before the publish, between publish and offset
  commit, or mid-write — the restarted query converges to the same
  bytes (test-pinned, including a deliberate double-apply). NULL merge
  keys would break this fixpoint (anti joins never match NULL, so a
  NULL-keyed row re-inserts on every replay): the sink REJECTS them by
  default (``null_key_policy="error"``) or drops them
  (``null_key_policy="drop"``) — they never reach the table.

Ordering contract: the published base does NOT retain ``seq_col``, so
incremental application is equivalent to one global merge only when the
feed delivers each key's changes in non-decreasing ``seq_col`` order
ACROSS batches — the natural property of a CDC log (within one batch,
order is irrelevant: the compaction is an argmax). Replaying the SAME
batch is always safe (fixpoint); REORDERING batches is not, and a feed
that can reorder must carry seq into the base schema instead.

The reference has no streaming or incremental path at all
(wstlr/play.py:79-117's mtime skip is per-source-file batch
re-extract); this is that gesture done properly.
"""

from __future__ import annotations

import functools
import operator as pyop
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ncpi_whistler_spark.operators.cdc import latest_change_per_key, merge_upsert

BUCKET_COL = "__bucket"
_COMMIT_MARKER = "_COMMITTED"
# "no parent captured" sentinel for the commit CAS (None is a valid
# parent state: the empty table)
_UNSET = object()

#: Default merge-on-read re-base interval (``cdc_merge_sink``
#: ``fold_every=None`` in mode='mor' resolves to this; pass 0 to never
#: fold). Set from the MEASURED knee of the chain-length read sweep in
#: tools/cdcbench.py (SCALEBENCH_CDC.json ``mor_read_sweep`` at sf0.1):
#: bytes scanned per read — the deterministic read-amplification
#: metric — stay within 1.5x of the chain-1 read through 16 chained
#: deltas on BOTH layouts (1.10x bucketed / 1.12x flat at 16) but the
#: flat layout crosses it at 64 (1.51x; wall-clock 6-7x on both) — the
#: binding knee, so the sink folds at 16 by default.
FOLD_EVERY_DEFAULT = 16


class ConcurrentWriterError(RuntimeError):
    """A second writer published to this VersionedTable; the losing
    writer fails loud instead of silently dropping updates."""


class VersionedTable:
    """Immutable, never-reused version directories + an atomically-
    swapped pointer file (format: ``<version>\\n<dirname>``).

    SINGLE-WRITER contract — ENFORCED by optimistic compare-and-swap:
    every publish records the pointer state (the raw pointer bytes)
    resolved when THIS writer last read the base for its merge
    (``read``/``read_buckets``/``fold``/``publish_delta`` capture it at
    resolution time; a blind full ``publish`` captures at publish
    start). ``_commit`` then takes an exclusive ``flock`` on
    ``_COMMITLOCK``, re-reads the pointer, and aborts with
    :class:`ConcurrentWriterError` if it moved — so of two writers that
    merged from the same base, the SECOND to commit always fails loud
    and its (uncommitted, invisible) directory is reclaimed by vacuum.
    The lock is held only around the check+swap; a crash releases it
    (kernel-owned), so there is no stale-token deadlock — the reason
    this is flock-CAS rather than a create-exclusive token file. The
    ``_LEASE`` file remains as a second line of defense for blind
    (no-read) publish alternation by a writer that previously held it.
    Two independent feeds into one table still want a real
    transactional table format (Delta/Iceberg optimistic commit — this
    CAS is exactly that protocol's local stand-in). Readers are
    unrestricted: they resolve the pointer once and then hold an
    immutable directory (snapshot isolation for the lifetime of their
    scan, bounded by vacuum retention).

    Optional bucketing: pass ``bucket_cols`` + ``num_buckets`` (persisted
    in ``_META`` and re-adopted on reopen) to lay every version out as
    ``__bucket=<i>`` partitions of ``pmod(hash(bucket_cols), N)`` —
    the layout :meth:`publish_incremental` prunes against.
    """

    def __init__(
        self,
        path: str,
        bucket_cols: list[str] | None = None,
        num_buckets: int | None = None,
        stats_cols: list[str] | None = None,
    ) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._token = f"{os.getpid()}-{uuid.uuid4().hex}"
        self._held_lease = False
        self._parent_token: object = _UNSET
        self._metric_mode: str | None = None  # fold() tags its publishes
        meta = self._read_meta()
        if meta is not None:
            mb, mn = meta.get("bucket_cols"), meta.get("num_buckets")
            if bucket_cols is not None and (bucket_cols != mb or num_buckets != mn):
                raise ValueError(
                    f"VersionedTable at {path} is bucketed by {mb} x {mn}; "
                    f"cannot reopen with {bucket_cols} x {num_buckets}"
                )
            bucket_cols, num_buckets = mb, mn
            ms = meta.get("stats_cols")
            if stats_cols is not None and ms is not None and stats_cols != ms:
                raise ValueError(
                    f"VersionedTable at {path} records stats for {ms}; "
                    f"cannot reopen with {stats_cols}"
                )
            if stats_cols is not None and ms is None:
                self._update_meta(stats_cols=stats_cols)
            else:
                stats_cols = ms
        else:
            if bucket_cols is not None:
                if not num_buckets or num_buckets < 1:
                    raise ValueError("bucket_cols requires num_buckets >= 1")
                self._write_meta(bucket_cols, num_buckets)
            if stats_cols is not None:
                self._update_meta(stats_cols=stats_cols)
        self.bucket_cols: list[str] | None = bucket_cols
        self.num_buckets: int | None = num_buckets
        self.stats_cols: list[str] | None = stats_cols

    # -- metadata / lease ------------------------------------------------

    def _read_meta(self) -> dict | None:
        import json

        try:
            with open(os.path.join(self.path, "_META")) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def _write_meta(self, bucket_cols: list[str], num_buckets: int) -> None:
        self._update_meta(bucket_cols=bucket_cols, num_buckets=num_buckets)

    def _update_meta(self, **kv) -> None:
        import json

        meta = self._read_meta() or {}
        meta.update(kv)
        tmp = os.path.join(self.path, "_META.tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, os.path.join(self.path, "_META"))

    def merge_spec(self) -> dict | None:
        """The (keys, seq_col, op_col, delete_op) a merge-on-read reader
        needs to fold the delta chain — persisted so ANY reader can
        resolve the live state, not just the writing sink."""
        meta = self._read_meta() or {}
        return meta.get("merge_spec")

    def set_merge_spec(
        self,
        keys: list[str],
        seq_col: str,
        op_col: str | None,
        delete_op: str = "D",
    ) -> None:
        spec = {
            "keys": keys,
            "seq_col": seq_col,
            "op_col": op_col,
            "delete_op": delete_op,
        }
        existing = self.merge_spec()
        if existing is not None and existing != spec:
            raise ValueError(
                f"VersionedTable at {self.path} already has merge spec "
                f"{existing}; cannot change to {spec}"
            )
        if existing is None:
            self._update_meta(merge_spec=spec)

    @property
    def _lease(self) -> str:
        return os.path.join(self.path, "_LEASE")

    def _lease_holder(self) -> str | None:
        try:
            with open(self._lease) as fh:
                return fh.read().strip() or None
        except OSError:
            return None

    def _acquire_lease(self) -> None:
        holder = self._lease_holder()
        if holder is not None and holder != self._token and self._held_lease:
            raise ConcurrentWriterError(
                f"VersionedTable {self.path}: writer lease was taken over by "
                f"{holder} after this writer published — a second concurrent "
                "publisher exists; refusing to overwrite its updates"
            )
        if holder != self._token:
            tmp = self._lease + f".{self._token}.tmp"
            with open(tmp, "w") as fh:
                fh.write(self._token)
            os.replace(tmp, self._lease)
        self._held_lease = True

    def _check_lease(self) -> None:
        if self._lease_holder() != self._token:
            raise ConcurrentWriterError(
                f"VersionedTable {self.path}: lost the writer lease mid-"
                "publish (another writer took over); aborting pointer swap"
            )

    # -- pointer ---------------------------------------------------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def _pointer_raw(self) -> str | None:
        """Raw pointer bytes (the commit-CAS identity) — None if the
        pointer does not exist (empty table)."""
        try:
            with open(self._pointer) as fh:
                return fh.read()
        except OSError:
            return None

    def _parse_pointer(self, raw: str | None) -> tuple[int, str, list[str]] | None:
        try:
            lines = [ln for ln in (raw or "").splitlines() if ln]
            version, dirname = int(lines[0]), lines[1]
            if not os.path.isdir(os.path.join(self.path, dirname)):
                return None
            chain = [
                d for d in lines[2:] if os.path.isdir(os.path.join(self.path, d))
            ]
            return version, dirname, chain
        except (ValueError, IndexError):
            return None

    def _read_pointer_full(self) -> tuple[int, str, list[str]] | None:
        """(version, base dirname, delta chain dirnames). The chain is
        non-empty only in merge-on-read mode: lines 3+ of the pointer
        name compacted delta directories to be merged over the base, in
        publish order."""
        return self._parse_pointer(self._pointer_raw())

    def _capture_parent(self) -> tuple[int, str, list[str]] | None:
        """Resolve the pointer AND record its raw bytes as this writer's
        commit-CAS parent. Called exactly where a writer binds data it
        will later publish against (read / read_buckets / fold /
        publish_delta / blind publish start) — the capture point is the
        base-resolution moment, so a pointer that moves between here and
        ``_commit`` aborts the publish (ADVICE r10: the lost-update
        window between a writer's base read and its pointer swap)."""
        raw = self._pointer_raw()
        self._parent_token = raw
        return self._parse_pointer(raw)

    def _read_pointer(self) -> tuple[int, str] | None:
        full = self._read_pointer_full()
        return (full[0], full[1]) if full else None

    def current_version(self) -> int | None:
        ptr = self._read_pointer()
        return ptr[0] if ptr else None

    def current_dir(self) -> str | None:
        """Directory of the current BASE (in merge-on-read mode the live
        state is this base merged with :meth:`current_chain`)."""
        ptr = self._read_pointer()
        return os.path.join(self.path, ptr[1]) if ptr else None

    def current_chain(self) -> list[str]:
        """Unfolded merge-on-read delta dirnames, publish order."""
        full = self._read_pointer_full()
        return full[2] if full else []

    # -- directory naming / commit state ---------------------------------

    def _next_pubseq(self) -> int:
        """Monotonic publish counter (deterministic replay resolution —
        no mtime races). Single-writer, so read-increment-replace is
        safe under the lease."""
        seq_path = os.path.join(self.path, "_PUBSEQ")
        try:
            with open(seq_path) as fh:
                seq = int(fh.read().strip())
        except (OSError, ValueError):
            seq = max(
                (p[1] for p in map(self._parse_dirname, os.listdir(self.path)) if p),
                default=0,
            )
        seq += 1
        tmp = seq_path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(seq))
        os.replace(tmp, seq_path)
        return seq

    @staticmethod
    def _parse_dirname(name: str) -> tuple[int, int] | None:
        """``v=<version>-<pubseq>-<token>`` -> (version, pubseq); the
        version may be negative (bootstrap convention), so split from
        the RIGHT. Unparseable names (foreign junk) -> None."""
        if not name.startswith("v="):
            return None
        parts = name[2:].rsplit("-", 2)
        if len(parts) != 3:
            return None
        try:
            return int(parts[0]), int(parts[1])
        except ValueError:
            return None

    def _is_committed(self, dirname: str) -> bool:
        return os.path.exists(os.path.join(self.path, dirname, _COMMIT_MARKER))

    def _committed_dirs(self) -> list[tuple[int, int, str]]:
        out = []
        for n in os.listdir(self.path):
            p = self._parse_dirname(n)
            if p and self._is_committed(n):
                out.append((p[0], p[1], n))
        return out

    # -- read ------------------------------------------------------------

    def _strip_bucket(self, df: DataFrame) -> DataFrame:
        return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df

    def _read_manifest(self, dirname: str) -> dict | None:
        import json

        try:
            with open(os.path.join(self.path, dirname, "_MANIFEST")) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    # -- file-skipping stats (local stand-in for Iceberg manifests) -------

    def _collect_file_stats(
        self, target: str, prev_stats: dict | None = None
    ) -> dict:
        """Per-file min/max for the declared ``stats_cols``, read from
        parquet FOOTERS via pyarrow (row-group statistics — metadata
        only, no data scan). Hard-linked carry-over files inherit their
        entry from the previous version's manifest (same relpath, same
        inode — the stats cannot have changed), so an incremental
        publish stays O(changed files). A column is recorded for a file
        only when EVERY row group has min/max (else the file can never
        be proven skippable); non-JSON-able types are skipped (kept =
        never wrongly pruned). Returns {relpath: {col: [min, max]}}."""
        if not self.stats_cols:
            return {}
        import pyarrow.parquet as pq

        out = {}
        want = set(self.stats_cols)
        for root, _, files in os.walk(target):
            for f in files:
                if f.startswith(("_", ".")) or not f.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(root, f), target)
                if prev_stats and rel in prev_stats:
                    out[rel] = prev_stats[rel]
                    continue
                try:
                    md = pq.ParquetFile(os.path.join(root, f)).metadata
                except Exception:
                    continue
                names = [
                    md.row_group(0).column(j).path_in_schema
                    for j in range(md.num_columns)
                ] if md.num_row_groups else []
                cols = {}
                for j, name in enumerate(names):
                    if name not in want:
                        continue
                    lo = hi = None
                    ok = True
                    for i in range(md.num_row_groups):
                        st = md.row_group(i).column(j).statistics
                        if st is None or not st.has_min_max:
                            ok = False
                            break
                        mn, mx = st.min, st.max
                        if not isinstance(mn, (int, float, str)) or not isinstance(
                            mx, (int, float, str)
                        ):
                            ok = False
                            break
                        lo = mn if lo is None else min(lo, mn)
                        hi = mx if hi is None else max(hi, mx)
                    if ok and lo is not None:
                        cols[name] = [lo, hi]
                if cols:
                    out[rel] = cols
        return out

    def _write_manifest_stats(self, dirname: str, stats: dict) -> None:
        import json

        if not stats:
            return
        man = self._read_manifest(dirname) or {}
        man["file_stats"] = stats
        tmp = os.path.join(self.path, dirname, "_MANIFEST.tmp")
        with open(tmp, "w") as fh:
            json.dump(man, fh)
        os.replace(tmp, os.path.join(self.path, dirname, "_MANIFEST"))

    @staticmethod
    def _file_may_match(col_stats: dict, where: dict) -> bool:
        """Can a file with these per-column [min,max] ranges contain a
        row satisfying the conjunctive range predicate? Missing stats
        for a predicate column → True (never wrongly pruned)."""
        for c, (lo, hi) in where.items():
            rng = col_stats.get(c)
            if rng is None:
                continue
            mn, mx = rng
            try:
                if lo is not None and mx < lo:
                    return False
                if hi is not None and mn > hi:
                    return False
            except TypeError:  # incomparable bound type: keep the file
                continue
        return True

    def _read_base_pruned(
        self, spark: SparkSession, base_dirname: str, where: dict | None
    ) -> DataFrame:
        """Scan of one version directory with manifest-stats file
        skipping applied: files whose recorded [min,max] cannot satisfy
        ``where`` are dropped from the read BEFORE the parquet scan —
        the I/O saving Iceberg/Delta get from manifest pruning. Files
        without stats are always read; the caller still applies the
        exact row predicate (file granularity over-approximates)."""
        d = os.path.join(self.path, base_dirname)
        stats = (self._read_manifest(base_dirname) or {}).get("file_stats")
        if not where or not stats:
            return spark.read.parquet(d)
        keep = []
        total = 0
        for root, _, files in os.walk(d):
            for f in files:
                if f.startswith(("_", ".")) or not f.endswith(".parquet"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, d)
                total += 1
                if self._file_may_match(stats.get(rel, {}), where):
                    keep.append(full)
        if len(keep) == total:
            return spark.read.parquet(d)
        if not keep:
            return self._strip_bucket(spark.read.parquet(d)).limit(0)
        return spark.read.parquet(*keep)

    @staticmethod
    def _where_predicate(where: dict):
        preds = []
        for c, (lo, hi) in where.items():
            if lo is not None:
                preds.append(F.col(c) >= F.lit(lo))
            if hi is not None:
                preds.append(F.col(c) <= F.lit(hi))
        return functools.reduce(pyop.and_, preds) if preds else F.lit(True)

    def _merged_view(
        self,
        spark: SparkSession,
        base_dirname: str,
        chain: list[str],
        where: dict | None = None,
    ) -> DataFrame:
        """Merge-on-read resolution: the base overlaid with the delta
        chain. Each chain entry is an already-compacted (one row per
        key) delta retaining op/seq columns; chain POSITION is the
        cross-batch ordering (per-key seq monotonicity across batches —
        the same feed contract the copy-on-write path relies on), so
        the fold is one argmax on chain index + one broadcast anti join
        against the base: identical plan shape to the batch merge, with
        the chain union standing in for the micro-batch.

        ``where`` file-prunes the BASE scan only; this stays exact
        because deltas are read in full (an update moving a row INTO
        the range arrives from the delta side regardless of which base
        file held its old version) and :meth:`read` re-applies the row
        predicate after the merge."""
        base = self._strip_bucket(
            self._read_base_pruned(spark, base_dirname, where)
        )
        if not chain:
            return base
        spec = self.merge_spec()
        if spec is None:
            raise ValueError(
                f"VersionedTable at {self.path} has a delta chain but no "
                "merge spec; call set_merge_spec before publish_delta"
            )
        deltas = [
            spark.read.parquet(os.path.join(self.path, d)).withColumn(
                "__chain_idx", F.lit(i)
            )
            for i, d in enumerate(chain)
        ]
        union = functools.reduce(DataFrame.unionByName, deltas).drop(
            spec["seq_col"]
        )
        return merge_upsert(
            base,
            union,
            keys=spec["keys"],
            seq_col="__chain_idx",
            op_col=spec["op_col"],
            delete_op=spec["delete_op"],
            broadcast_delta=True,
        )

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        where: dict | None = None,
    ) -> DataFrame | None:
        """Read the current version, or — time travel — a specific
        retained ``version`` (None if that version was never published,
        never committed, or was vacuumed). With multiple publishes of
        one version id (batch replays), the highest publish sequence
        wins. Only COMMITTED directories are ever served. Merge-on-read
        states (delta chains) resolve transparently — live via the
        pointer, time travel via the per-version _MANIFEST snapshot
        (bounded by vacuum retention like any other version).

        ``where={col: (lo, hi)}`` (inclusive, None = open end) applies
        the conjunctive range predicate EXACTLY — and, on a table with
        declared ``stats_cols``, first skips every base file whose
        manifest [min,max] cannot match (inputFiles shrinks; the local
        stand-in for Iceberg manifest pruning, same argument as the
        hard-link carry-over). Without stats it degrades to a plain
        row filter — never wrong, just unpruned."""
        out = None
        if version is None:
            full = self._capture_parent()
            if full is None:
                return None
            out = self._merged_view(spark, full[1], full[2], where=where)
        else:
            cands = [
                (ps, n) for v, ps, n in self._committed_dirs() if v == version
            ]
            if not cands:
                return None
            dirname = max(cands)[1]
            man = self._read_manifest(dirname)
            if man is not None and "base" in man:
                missing = [
                    d
                    for d in [man["base"]] + man["chain"]
                    if not os.path.isdir(os.path.join(self.path, d))
                ]
                if missing:
                    return None  # vacuumed past this snapshot
                out = self._merged_view(
                    spark, man["base"], man["chain"], where=where
                )
            else:
                out = self._strip_bucket(
                    self._read_base_pruned(spark, dirname, where)
                )
        if where:
            out = out.where(self._where_predicate(where))
        return out

    def read_buckets(
        self, spark: SparkSession, buckets: list[int], base_only: bool = False
    ) -> DataFrame | None:
        """Read ONLY the given buckets of the current version (partition
        pruning on the ``__bucket`` directory column); bucket column
        stripped from the result.

        Fails loud when a merge-on-read delta chain is live: the base
        buckets alone are STALE state, and unlike :meth:`read` this
        method cannot resolve the chain (a delta is not bucket-pruned).
        Internal callers that deliberately want the pre-fold base
        (``fold`` itself) pass ``base_only=True``."""
        if self.num_buckets is None:
            raise ValueError("read_buckets requires a bucketed table")
        full = self._capture_parent()
        if full is None:
            return None
        if full[2] and not base_only:
            raise ValueError(
                f"VersionedTable at {self.path} has a live merge-on-read "
                f"delta chain ({len(full[2])} deltas); read_buckets would "
                "return stale base-only rows — use read() (resolves the "
                "chain) or fold() first, or pass base_only=True if the "
                "pre-fold base is genuinely what you want"
            )
        d = os.path.join(self.path, full[1])
        df = spark.read.parquet(d)
        if BUCKET_COL not in df.columns:  # pre-bucketing version
            return df
        return self._strip_bucket(
            df.where(F.col(BUCKET_COL).isin([int(b) for b in buckets]))
        )

    def lookup(self, spark: SparkSession, keys: list) -> DataFrame | None:
        """Point lookups by bucket key — the READ-side payoff of the
        bucket layout, symmetric with the write-side pruning: the
        requested key values are hashed to their buckets with the same
        ``pmod(hash(bucket_cols), N)`` expression the publisher used, so
        the scan touches only those bucket partitions (at 100 TB: O(1)
        files per key instead of a full-table scan — the hash-layout
        half of what an index gives you). ``keys`` is a list of scalars
        (single bucket column) or tuples (composite). Exact: the
        bucket-pruned subset is then semi-joined to the requested keys.
        On a live merge-on-read chain this falls back to the resolved
        :meth:`read` view (no bucket pruning — deltas are not
        bucketed — but always correct); fold to restore pruned lookups.
        None before the first publish."""
        if self.num_buckets is None:
            raise ValueError("lookup requires a bucketed table")
        if not keys:
            raise ValueError("lookup needs at least one key value")
        full = self._read_pointer_full()
        if full is None:
            return None
        cols = list(self.bucket_cols or [])
        rows = [
            tuple(k) if isinstance(k, (tuple, list)) else (k,) for k in keys
        ]
        key_schema = (
            spark.read.parquet(os.path.join(self.path, full[1]))
            .select(*cols)
            .schema
        )
        kdf = spark.createDataFrame(rows, key_schema)
        if full[2]:  # live MOR chain: correct-but-unpruned fallback
            return self.read(spark).join(
                F.broadcast(kdf), on=cols, how="left_semi"
            )
        buckets = sorted(
            r[0]
            for r in kdf.select(self._bucket_expr().alias("b"))
            .distinct()
            .collect()
        )
        sub = self.read_buckets(spark, buckets)
        return sub.join(F.broadcast(kdf), on=cols, how="left_semi")

    def changes_since(
        self, spark: SparkSession, version: int, op_col: str = "change_op"
    ) -> DataFrame | None:
        """The downstream CDF-consumer call: the I/U/D rows that turn
        retained snapshot ``version`` into the CURRENT version — a
        subscriber remembers the last version it applied and polls this
        instead of re-reading the table (:meth:`diff` against the live
        pointer). None when ``version`` is no longer retained (the
        consumer fell behind vacuum retention — it must re-bootstrap
        from a full read; fail-null, never a partial feed)."""
        cur = self.current_version()
        if cur is None:
            return None
        return self.diff(spark, version, cur, op_col=op_col)

    def versions(self) -> list[int]:
        """Retained (committed, readable) version ids, ascending."""
        return sorted({v for v, _, _ in self._committed_dirs()})

    def diff(
        self,
        spark: SparkSession,
        v_from: int,
        v_to: int,
        keys: list[str] | None = None,
        op_col: str = "change_op",
    ) -> DataFrame | None:
        """Change-data-feed BETWEEN two retained versions: the I/U/D
        rows that turn snapshot ``v_from`` into snapshot ``v_to``
        (operators/cdc.table_diff) — what a downstream consumer replays
        instead of re-reading the whole table. Keys default to the
        persisted merge spec. None if either version is unreadable
        (never published or vacuumed)."""
        from ncpi_whistler_spark.operators.cdc import table_diff

        if keys is None:
            spec = self.merge_spec()
            if spec is None:
                raise ValueError(
                    "diff needs keys (no merge spec persisted on this table)"
                )
            keys = spec["keys"]
        old = self.read(spark, version=v_from)
        new = self.read(spark, version=v_to)
        if old is None or new is None:
            return None
        return table_diff(old, new, keys=keys, op_col=op_col)

    # -- per-publish ops metrics ------------------------------------------

    def _emit_metric(
        self,
        dirname: str,
        version: int,
        mode: str,
        buckets_rewritten: int,
        buckets_linked: int,
        bytes_new: int,
        bytes_linked: int,
        chain_len: int,
    ) -> None:
        """Append ONE row to the ``_metrics`` parquet log next to the
        version directories — the observability a long-running stream
        needs to detect delta-shape drift (a feed suddenly touching all
        buckets shows up as buckets_rewritten jumping to num_buckets;
        an unfolded MOR chain shows up as chain_len climbing). Written
        driver-side with pyarrow (one tiny file per publish, no Spark
        job); read back via :meth:`metrics`. Only SUCCESSFUL publishes
        emit (a CAS-aborted publish has no reader-visible effect and no
        metric row). Metric emission is best-effort: a failure here
        must never fail a publish that already committed."""
        import time

        try:
            import pyarrow as pa
            import pyarrow.parquet as pq

            mdir = os.path.join(self.path, "_metrics")
            os.makedirs(mdir, exist_ok=True)
            row = pa.table(
                {
                    "version": pa.array([int(version)], pa.int64()),
                    "pubseq": pa.array(
                        [(self._parse_dirname(dirname) or (0, 0))[1]], pa.int64()
                    ),
                    "dirname": pa.array([dirname], pa.string()),
                    "mode": pa.array([mode], pa.string()),
                    "buckets_rewritten": pa.array([int(buckets_rewritten)], pa.int64()),
                    "buckets_linked": pa.array([int(buckets_linked)], pa.int64()),
                    "bytes_new": pa.array([int(bytes_new)], pa.int64()),
                    "bytes_linked": pa.array([int(bytes_linked)], pa.int64()),
                    "chain_len": pa.array([int(chain_len)], pa.int64()),
                    "ts_epoch": pa.array([time.time()], pa.float64()),
                }
            )
            pq.write_table(
                row, os.path.join(mdir, f"m-{dirname[2:]}.parquet")
            )
        except Exception:
            pass  # observability must not fail the publish

    def metrics(self, spark: SparkSession) -> DataFrame | None:
        """The per-publish ops log as a DataFrame (None before the first
        publish): one row per successful publish with mode (full /
        incremental / delta / fold), buckets rewritten vs hard-linked,
        bytes written vs carried, and merge-on-read chain length —
        queryable with plain DataFrame ops (tools/cdcbench.py consumes
        it for the rewrite∝delta claim)."""
        mdir = os.path.join(self.path, "_metrics")
        if not os.path.isdir(mdir) or not os.listdir(mdir):
            return None
        return spark.read.parquet(mdir)

    def _version_dir_stats(
        self, target: str, changed: set[int] | None
    ) -> tuple[int, int, int, int]:
        """(buckets_rewritten, buckets_linked, bytes_new, bytes_linked)
        for a just-written version directory. ``changed`` classifies
        bucket partitions (None = everything newly written)."""
        rew = lnk = bytes_new = bytes_linked = 0
        for entry in os.listdir(target):
            p = os.path.join(target, entry)
            if entry.startswith(f"{BUCKET_COL}="):
                try:
                    b = int(entry.split("=", 1)[1])
                except ValueError:
                    continue
                size = sum(
                    os.path.getsize(os.path.join(p, f))
                    for f in os.listdir(p)
                    if not f.startswith(("_", "."))
                )
                if changed is None or b in changed:
                    rew += 1
                    bytes_new += size
                else:
                    lnk += 1
                    bytes_linked += size
            elif not entry.startswith(("_", ".")) and os.path.isfile(p):
                bytes_new += os.path.getsize(p)
        return rew, lnk, bytes_new, bytes_linked

    # -- write -----------------------------------------------------------

    def _bucket_expr(self):
        return F.pmod(
            F.hash(*[F.col(c) for c in (self.bucket_cols or [])]),
            F.lit(int(self.num_buckets)),
        ).cast("int")

    def _ensure_readable_empty(self, df: DataFrame, target: str) -> None:
        """A partitionBy write of ZERO rows produces no files at all —
        the directory would be unreadable (UNABLE_TO_INFER_SCHEMA). If
        no bucket directory materialized, rewrite as a plain (schema-
        bearing) empty parquet; readers strip the bucket column anyway
        and read_buckets handles the bucketless empty version."""
        if not any(e.startswith(f"{BUCKET_COL}=") for e in os.listdir(target)):
            df.drop(BUCKET_COL).write.mode("overwrite").parquet(target)

    def _commit(
        self,
        dirname: str,
        version: int,
        base_dirname: str | None = None,
        chain: list[str] | None = None,
        base_columns: list[str] | None = None,
    ) -> None:
        """Compare-and-swap commit under an exclusive ``flock``:

        1. re-read the pointer; if it moved since this writer captured
           its parent state (:meth:`_capture_parent`), abort with
           :class:`ConcurrentWriterError` — the directory stays
           UNCOMMITTED (invisible to readers, reclaimed by vacuum), so
           the losing publish has zero reader-visible effect;
        2. re-check the lease (blind-publish second line of defense);
        3. write ``base_columns`` into ``_META`` BEFORE the pointer
           swap — schema metadata can never lag the live version (a
           crash between the two leaves meta at-or-ahead, which the
           replayed batch re-publishes past; meta-BEHIND would make
           ``publish_delta``'s schema gate validate against stale
           columns);
        4. write the ``_COMMITTED`` marker, then atomically swap the
           pointer.

        The flock serializes check+swap across processes and is
        kernel-released on crash — no stale-token deadlock, unlike a
        create-exclusive commit-token file. With ``base_dirname``/
        ``chain`` the pointer records a merge-on-read state (base +
        delta chain); otherwise ``dirname`` IS the full state and any
        previous chain is implicitly folded away."""
        import fcntl

        expected = self._parent_token
        self._parent_token = _UNSET  # consumed either way
        with open(os.path.join(self.path, "_COMMITLOCK"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                if expected is not _UNSET and self._pointer_raw() != expected:
                    raise ConcurrentWriterError(
                        f"VersionedTable {self.path}: pointer moved since this "
                        "writer resolved its base — a concurrent writer "
                        f"published in between; aborting publish of {dirname} "
                        "instead of silently dropping the other writer's "
                        "updates (directory left uncommitted for vacuum)"
                    )
                self._check_lease()
                if base_columns is not None:
                    self._update_meta(base_columns=base_columns)
                with open(
                    os.path.join(self.path, dirname, _COMMIT_MARKER), "w"
                ) as fh:
                    fh.write(self._token)
                lines = [str(version), base_dirname or dirname] + list(chain or [])
                tmp = self._pointer + f".{self._token}.tmp"
                with open(tmp, "w") as fh:
                    fh.write("\n".join(lines) + "\n")
                os.replace(tmp, self._pointer)  # atomic on POSIX
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    def publish(self, df: DataFrame, version: int) -> str:
        """Write ``df`` in FULL into a fresh directory for ``version``
        and atomically re-point. Never writes into an existing
        directory — a replayed batch's merge plan is still lazily
        READING the current version while this write runs."""
        if self._parent_token is _UNSET:
            # blind publish (no prior base read by this writer): the CAS
            # parent is the pointer at publish start
            self._capture_parent()
        self._acquire_lease()
        dirname = f"v={version}-{self._next_pubseq()}-{uuid.uuid4().hex[:8]}"
        target = os.path.join(self.path, dirname)
        if self.num_buckets is not None:
            # co-partition on the bucket id before partitionBy so each
            # bucket directory gets ONE file instead of one per writer
            # task (a naive partitionBy writes tasks x buckets files —
            # measured as the dominant q107 local cost and a small-file
            # explosion at scale)
            (
                df.withColumn(BUCKET_COL, self._bucket_expr())
                .repartition(int(self.num_buckets), F.col(BUCKET_COL))
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(target)
            )
            self._ensure_readable_empty(df, target)
        else:
            df.write.mode("overwrite").parquet(target)
        # footer-only stats pass BEFORE the commit: a reader resolving
        # the new pointer immediately gets file skipping
        self._write_manifest_stats(dirname, self._collect_file_stats(target))
        self._commit(
            dirname,
            version,
            base_columns=[c for c in df.columns if c != BUCKET_COL],
        )
        mode, self._metric_mode = self._metric_mode or "full", None
        rew, lnk, bn, bl = self._version_dir_stats(target, None)
        self._emit_metric(dirname, version, mode, rew, lnk, bn, bl, 0)
        return dirname

    def publish_incremental(
        self, changed_df: DataFrame, version: int, changed_buckets: list[int]
    ) -> str:
        """Publish a new version whose CHANGED buckets are rewritten from
        ``changed_df`` (base-schema rows, bucket column recomputed here)
        and whose untouched buckets are HARD-LINKED file-by-file from the
        current version — per-publish I/O is O(changed buckets), not
        O(base). A changed bucket that ends up empty (every key deleted)
        is simply absent from the new version. Requires a bucketed table
        with a live current version (bootstrap goes through
        :meth:`publish`)."""
        if self.num_buckets is None:
            raise ValueError("publish_incremental requires a bucketed table")
        # the carry-over source MUST be the same version the merged data
        # was read from — resolve it from the captured CAS parent (set by
        # the read_buckets call that produced changed_df) so a pointer
        # move in between can never mix two versions' buckets
        full = (
            self._capture_parent()
            if self._parent_token is _UNSET
            else self._parse_pointer(self._parent_token)  # type: ignore[arg-type]
        )
        if full is None:
            raise ValueError("publish_incremental requires an existing version")
        prev = os.path.join(self.path, full[1])
        self._acquire_lease()
        changed = {int(b) for b in changed_buckets}
        dirname = f"v={version}-{self._next_pubseq()}-{uuid.uuid4().hex[:8]}"
        target = os.path.join(self.path, dirname)
        (
            changed_df.withColumn(BUCKET_COL, self._bucket_expr())
            .repartition(max(len(changed), 1), F.col(BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(target)
        )
        # carry untouched buckets by hard link (same inode, zero data
        # copied) — the local stand-in for a manifest that keeps
        # unchanged files by reference; copy2 fallback for filesystems
        # without link support.
        for entry in os.listdir(prev):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            try:
                b = int(entry.split("=", 1)[1])
            except ValueError:
                continue
            if b in changed:
                continue
            src_dir = os.path.join(prev, entry)
            dst_dir = os.path.join(target, entry)
            os.makedirs(dst_dir, exist_ok=True)
            for fname in os.listdir(src_dir):
                if fname.startswith(("_", ".")):
                    continue
                src, dst = os.path.join(src_dir, fname), os.path.join(dst_dir, fname)
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)
        self._ensure_readable_empty(changed_df, target)
        # carried-over (hard-linked) files inherit their stats entry from
        # the previous manifest — the stats pass stays O(changed files)
        prev_stats = (self._read_manifest(os.path.basename(prev)) or {}).get(
            "file_stats"
        )
        self._write_manifest_stats(
            dirname, self._collect_file_stats(target, prev_stats)
        )
        self._commit(
            dirname,
            version,
            base_columns=[c for c in changed_df.columns if c != BUCKET_COL],
        )
        mode, self._metric_mode = self._metric_mode or "incremental", None
        rew, lnk, bn, bl = self._version_dir_stats(target, changed)
        self._emit_metric(dirname, version, mode, rew, lnk, bn, bl, 0)
        return dirname

    def publish_delta(self, compacted_delta: DataFrame, version: int) -> str:
        """Merge-on-READ commit: write only the compacted micro-batch
        (one row per key, seq/op retained) into a fresh delta directory
        and append it to the pointer's chain — per-publish I/O is
        O(delta) LITERALLY (no base bucket is rewritten at all); readers
        fold the chain via :meth:`read` and :meth:`fold` periodically
        re-bases it. The write-optimized end of the trade the
        copy-on-write incremental publish sits in the middle of.

        Requires :meth:`set_merge_spec` (persisted, so any reader can
        fold) and an existing base (bootstrap via :meth:`publish`). A
        replayed batch REPLACES its own chain entry (same version id) —
        never appends a duplicate. Each delta dir carries a _MANIFEST
        snapshot (base + chain) for time travel. Schema is checked
        against the recorded base columns — fail-loud, widening a MOR
        table means fold first, then evolve through the merge path."""
        spec = self.merge_spec()
        if spec is None:
            raise ValueError("publish_delta requires set_merge_spec first")
        # the new chain is built from THIS pointer state — CAS against it
        full = self._capture_parent()
        if full is None:
            raise ValueError(
                "publish_delta requires an existing base version "
                "(bootstrap via publish)"
            )
        _, base_dirname, chain = full
        meta = self._read_meta() or {}
        base_cols = meta.get("base_columns")
        if base_cols is not None:
            want = set(base_cols) | {spec["seq_col"]} | (
                {spec["op_col"]} if spec["op_col"] else set()
            )
            if set(compacted_delta.columns) != want:
                raise ValueError(
                    f"publish_delta: delta columns {sorted(compacted_delta.columns)} "
                    f"!= base+spec columns {sorted(want)} — schema changes "
                    "must go through fold + merge_upsert(evolve=True)"
                )
        self._acquire_lease()
        import json

        dirname = f"v={version}-{self._next_pubseq()}-{uuid.uuid4().hex[:8]}"
        target = os.path.join(self.path, dirname)
        compacted_delta.write.mode("overwrite").parquet(target)
        new_chain = [
            d
            for d in chain
            if (self._parse_dirname(d) or (None, None))[0] != version
        ] + [dirname]
        with open(os.path.join(target, "_MANIFEST"), "w") as fh:
            json.dump({"base": base_dirname, "chain": new_chain}, fh)
        self._commit(dirname, version, base_dirname=base_dirname, chain=new_chain)
        bytes_new = sum(
            os.path.getsize(os.path.join(target, f))
            for f in os.listdir(target)
            if not f.startswith(("_", "."))
        )
        self._emit_metric(
            dirname, version, "delta", 0, 0, bytes_new, 0, len(new_chain)
        )
        return dirname

    def fold(self, spark: SparkSession, version: int | None = None) -> str | None:
        """Re-base a merge-on-read chain: merge every chained delta into
        the base and publish the result as a NEW base version (pointer
        chain resets). On a bucketed table the fold itself is the
        partition-pruned incremental publish — only buckets containing
        chain keys are rewritten, the rest hard-link. No-op (returns
        None) when the chain is empty."""
        raw0 = self._pointer_raw()
        full = self._parse_pointer(raw0)
        if full is None or not full[2]:
            return None
        cur_version, base_dirname, chain = full
        version = cur_version if version is None else version
        spec = self.merge_spec()
        if self.num_buckets is not None:
            deltas = [
                spark.read.parquet(os.path.join(self.path, d)).withColumn(
                    "__chain_idx", F.lit(i)
                )
                for i, d in enumerate(chain)
            ]
            union = functools.reduce(DataFrame.unionByName, deltas).drop(
                spec["seq_col"]
            )
            winners = latest_change_per_key(
                union, spec["keys"], "__chain_idx"
            ).localCheckpoint(eager=True)
            changed = sorted(
                r[0]
                for r in winners.select(self._bucket_expr().alias("b"))
                .distinct()
                .collect()
            )
            base_sub = self.read_buckets(spark, changed, base_only=True)
            merged_sub = merge_upsert(
                base_sub,
                winners,
                keys=spec["keys"],
                seq_col="__chain_idx",
                op_col=spec["op_col"],
                delete_op=spec["delete_op"],
                broadcast_delta=True,
            )
            # CAS against the state whose CHAIN this fold absorbed (the
            # read_buckets call above re-captured a possibly-later
            # pointer; a chain entry published in between must abort)
            self._parent_token = raw0
            self._metric_mode = "fold"
            return self.publish_incremental(merged_sub, version, changed)
        merged = self._merged_view(spark, base_dirname, chain)
        self._parent_token = raw0
        self._metric_mode = "fold"
        return self.publish(merged, version)

    def vacuum(self, keep: int = 2) -> list[str]:
        """Remove unreferenced version directories: every UNCOMMITTED
        orphan goes first, then superseded committed versions beyond the
        ``keep``-1 most recent (by publish sequence) besides the live
        set (base + any unfolded delta chain). RETAINED merge-on-read
        snapshots stay RESOLVABLE: any kept directory's _MANIFEST pins
        its base and chain dirs too, so a time-travel read of a kept
        delta version never returns torn state. Hard-linked carry-over
        files make removal safe — deleting an old version never breaks
        a newer version that links its files. Retention must still
        cover the longest concurrent read."""
        ptr = self._read_pointer_full()
        live = {ptr[1], *ptr[2]} if ptr else set()
        removed = []
        committed = []
        for d in os.listdir(self.path):
            if not d.startswith("v=") or d in live:
                continue
            p = self._parse_dirname(d)
            if p is None or not self._is_committed(d):
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
                removed.append(d)
            else:
                committed.append((p[1], d))
        committed.sort(reverse=True)
        kept = live | {d for _, d in committed[: max(keep - 1, 0)]}
        # manifest closure: a kept MOR snapshot pins its base + chain
        # (manifests only reference FULL versions and older deltas, so
        # one expansion pass per frontier converges)
        frontier = list(kept)
        while frontier:
            refs = set()
            for d in frontier:
                man = self._read_manifest(d)
                if man and "base" in man:
                    refs.update([man["base"], *man["chain"]])
            frontier = [d for d in refs if d not in kept]
            kept |= refs
        for _, d in committed[max(keep - 1, 0):]:
            if d in kept:
                continue
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
    null_key_policy: str = "error",
    evolve: bool = False,
    vacuum_keep: int | None = None,
    compact_every: int | None = None,
    mode: str = "cow",
    fold_every: int | None = None,
):
    """foreachBatch callable: merge each micro-batch of the change log
    into ``table``. The batch delta is always broadcast (a micro-batch
    is dimension-sized vs the base by construction). On a bucketed table
    the publish is INCREMENTAL: only buckets containing changed keys are
    read, merged, and rewritten; untouched buckets carry over by hard
    link (O(delta) I/O per batch, not O(base)).

    ``mode``: the write/read trade. ``"cow"`` (copy-on-write, default)
    merges eagerly per batch — reads see a plain parquet layout, writes
    pay O(changed buckets). ``"mor"`` (merge-on-read) publishes only
    the compacted delta per batch (O(delta) write, literally — no
    bucket rewritten) and defers the merge to readers;
    ``fold_every=n`` re-bases automatically once the chain reaches n
    deltas (on a bucketed table the fold itself is the partition-pruned
    incremental publish); ``None`` resolves to
    :data:`FOLD_EVERY_DEFAULT` (= 16, the measured knee of the
    chain-length read sweep — SCALEBENCH_CDC.json ``mor_read_sweep``:
    bytes scanned per read stay within 1.5x of the chain-1 read
    through 16 deltas and climb past it); ``0`` never folds
    (callers own re-basing). Same exactly-once-effect guarantees: a
    replayed batch REPLACES its own chain entry. Schema evolution is
    cow-only (a MOR chain must keep one schema); mor+evolve raises.

    ``null_key_policy``: NULL merge keys break replay idempotence (anti
    joins never match NULL, so a NULL-keyed winner re-inserts on every
    replay) — ``"error"`` (default) fails the batch loudly; ``"drop"``
    filters them out. ``evolve``: forwarded to :func:`merge_upsert`
    (schema-widening deltas NULL-backfill history; a widening batch on a
    bucketed table falls back to one full rewrite so every bucket file
    carries the new schema).

    Housekeeping for LONG-RUNNING streams (a table accretes one version
    per micro-batch forever otherwise): ``vacuum_keep=k`` vacuums after
    every publish keeping the k most recent committed versions (hard
    links make this safe for versions that carry files forward; size k
    to cover the longest concurrent reader), and ``compact_every=n``
    runs :func:`~ncpi_whistler_spark.storage.compact_versioned` after
    every n-th batch — incremental publishes accrete small per-bucket
    delta files, periodic compaction restores scan efficiency. Both are
    no-ops when None.
    """
    if null_key_policy not in ("error", "drop"):
        raise ValueError(f"null_key_policy must be error|drop, got {null_key_policy!r}")
    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be cow|mor, got {mode!r}")
    if mode == "mor" and fold_every is None:
        # measured knee (SCALEBENCH_CDC mor_read_sweep); 0 = never fold
        fold_every = FOLD_EVERY_DEFAULT
    if mode == "mor" and evolve:
        raise ValueError(
            "mode='mor' cannot evolve schemas mid-chain: fold first, then "
            "widen through the cow path (merge_upsert(evolve=True))"
        )

    def sink(mb: DataFrame, batch_id: int) -> None:
        # foreachBatch hands a DataFrame bound to the micro-batch's
        # cloned session; do ALL reads/joins through it (mixing the
        # outer session's base scan with the batch frame is fragile on a
        # cluster — session confs/AQE diverge). Outer spark is only the
        # bootstrap fallback for mocks without a session.
        s = getattr(mb, "sparkSession", None) or spark
        null_pred = functools.reduce(
            pyop.or_, (F.col(k).isNull() for k in keys)
        )
        if null_key_policy == "drop":
            mb = mb.where(~null_pred)

        def _reject_null_keys(df: DataFrame) -> None:
            """error-policy check. On the compacted paths this runs over
            the (pinned, key-sized) winners instead of rescanning the
            raw micro-batch — NULL keys survive compaction (they group
            under the NULL key), so detection is equivalent and one full
            batch scan cheaper."""
            if null_key_policy == "error" and df.where(null_pred).limit(1).count() > 0:
                raise ValueError(
                    f"CDC batch {batch_id}: NULL value in merge key(s) {keys} — "
                    "NULL keys can never match (anti-join semantics), so they "
                    "would re-insert on every replay and break exactly-once "
                    "effect. Fix the feed or use null_key_policy='drop'."
                )

        base = table.read(s)
        if base is None:
            drop = {seq_col} | ({op_col} if op_col else set())
            base_cols = [c for c in mb.columns if c not in drop]
            base = mb.select(*base_cols).where(F.lit(False))
        kw = dict(
            keys=keys,
            seq_col=seq_col,
            op_col=op_col,
            delete_op=delete_op,
            broadcast_delta=True,
            evolve=evolve,
        )
        widening = evolve and any(
            c not in set(base.columns) | {seq_col, op_col} for c in mb.columns
        )
        if mode == "mor" and table.current_dir() is not None:
            # merge-on-READ: compact, publish the delta alone, re-base
            # only when the chain is long enough
            table.set_merge_spec(keys, seq_col, op_col, delete_op)
            latest = latest_change_per_key(mb, keys, seq_col).localCheckpoint(
                eager=True
            )
            _reject_null_keys(latest)
            table.publish_delta(latest, int(batch_id))
            if fold_every and len(table.current_chain()) >= fold_every:
                table.fold(s)
        elif (
            table.num_buckets is not None
            and table.current_dir() is not None
            and not widening
        ):
            if table.current_chain():
                table.fold(s)  # a cow publish must not strand MOR deltas
            # Compact ONCE, pin the (micro-batch-sized) winners, and
            # derive the changed-bucket set from them; the same frame
            # feeds the merge (re-compacting an already-compacted delta
            # is a no-op on |keys| rows) and the null check.
            latest = latest_change_per_key(mb, keys, seq_col).localCheckpoint(
                eager=True
            )
            _reject_null_keys(latest)
            changed = sorted(
                r[0]
                for r in latest.select(
                    table._bucket_expr().alias("b")
                ).distinct().collect()
            )
            base_sub = table.read_buckets(s, changed)
            merged_sub = merge_upsert(base_sub, latest, **kw)
            table.publish_incremental(merged_sub, int(batch_id), changed)
        else:
            _reject_null_keys(mb)
            merged = merge_upsert(base, mb, **kw)
            table.publish(merged, int(batch_id))
        if compact_every and (int(batch_id) + 1) % compact_every == 0:
            from ncpi_whistler_spark.storage import compact_versioned

            compact_versioned(s, table)
        if vacuum_keep is not None:
            table.vacuum(keep=vacuum_keep)

    return sink


#: The schema `spark.readStream.format("kafka")` emits — the record
#: shape every bus adapter (and the kafka_file test replay) produces.
KAFKA_RECORD_DDL = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def parse_kafka_changes(raw: DataFrame, schema) -> DataFrame:
    """Kafka-record-shaped change feed (binary ``key``/``value`` + topic
    metadata) → change-log records: JSON-decode ``value`` against the
    CDC schema. Shared by the real Kafka branch of
    :func:`read_changes_stream_config` and by tests replaying a
    kafka-shaped file stream — the same executable-source-swap pattern
    as ``streaming/windows.parse_kafka_events``: the merge sink consumes
    only this function's output schema, never the source."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("c")
    ).select("c.*")


def read_changes_stream_config(spark: SparkSession, conf: dict, schema) -> DataFrame:
    """Config-driven change-feed source selector — the production entry
    point where the feed source is deployment config, not code.

    ``{"source": "file", "dir": ...}`` streams change-log parquet files
    (tests / backfill); ``{"source": "kafka", "bootstrap_servers": ...,
    "topic": ...}`` builds the standard Kafka reader (spark-sql-kafka
    connector on the classpath) decoded by :func:`parse_kafka_changes`;
    ``{"source": "kafka_file", "dir": ...}`` replays kafka-record-SHAPED
    parquet (a topic dump / the test mock) through the SAME decode path
    as the real bus. All branches emit the caller's CDC schema, so
    :func:`run_cdc_stream`'s merge sink is source-agnostic by
    construction."""
    source = conf.get("source", "file")
    if source == "file":
        return spark.readStream.schema(schema).parquet(conf["dir"])
    if source == "kafka":
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", conf["bootstrap_servers"])
            .option("subscribe", conf["topic"])
            .option("startingOffsets", conf.get("starting_offsets", "earliest"))
            .load()
        )
        return parse_kafka_changes(raw, schema)
    if source == "kafka_file":
        raw = spark.readStream.schema(KAFKA_RECORD_DDL).parquet(conf["dir"])
        return parse_kafka_changes(raw, schema)
    raise ValueError(
        f"unknown CDC source {source!r}; expected 'file', 'kafka', or "
        "'kafka_file'"
    )


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
    bucket_cols: list[str] | None = None,
    num_buckets: int | None = None,
    null_key_policy: str = "error",
    evolve: bool = False,
    vacuum_keep: int | None = None,
    compact_every: int | None = None,
    mode: str = "cow",
    fold_every: int | None = None,
    stats_cols: list[str] | None = None,
    source_conf: dict | None = None,
) -> VersionedTable:
    """Drain the change feed into the versioned table at ``table_path``
    (``availableNow`` trigger — call again after more data arrives; the
    shared checkpoint guarantees no batch is re-read and any
    half-applied batch is replayed, which the idempotent merge absorbs).
    The feed arrives from ``source_dir`` (change-log parquet files) or,
    with ``source_conf``, from any :func:`read_changes_stream_config`
    source — a Kafka topic swaps in as deployment config without
    touching the merge sink (pass ``source_dir=None`` then). Pass
    ``bucket_cols``/``num_buckets`` to lay the table out for the
    partition-pruned incremental publish."""
    table = VersionedTable(
        table_path,
        bucket_cols=bucket_cols,
        num_buckets=num_buckets,
        stats_cols=stats_cols,
    )
    cp = checkpoint or os.path.join(table_path, "_checkpoint")
    conf = source_conf or {"source": "file", "dir": source_dir}
    q = (
        read_changes_stream_config(spark, conf, schema)
        .writeStream.foreachBatch(
            cdc_merge_sink(
                spark,
                table,
                keys,
                seq_col,
                op_col,
                delete_op,
                null_key_policy=null_key_policy,
                evolve=evolve,
                vacuum_keep=vacuum_keep,
                compact_every=compact_every,
                mode=mode,
                fold_every=fold_every,
            )
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
