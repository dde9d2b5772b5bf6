"""Merge-on-read CDC publish: per-batch commits are the compacted delta
alone (O(delta) write, no bucket rewritten), readers fold the chain,
fold() re-bases through the partition-pruned incremental publish —
the write-optimized end of the trade the copy-on-write path sits in the
middle of. Same exactly-once-effect contract (replayed batch replaces
its own chain entry)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ncpi_whistler_spark.streaming.cdc import (
    BUCKET_COL,
    VersionedTable,
    cdc_merge_sink,
    run_cdc_stream,
)

from tests.test_streaming_cdc_incremental import (
    N_BUCKETS,
    SCHEMA,
    _batches,
    _bucket_files,
    _expected,
    _rows,
    _run_all,
)


def test_mor_stream_matches_cow_and_writes_no_base_buckets(spark, tmp_path):
    """End state via merge-on-read == copy-on-write == truth, and a MOR
    delta publish rewrites ZERO base buckets (the base dir stays the
    bootstrap dir until fold)."""
    cow = _run_all(spark, tmp_path, "cow", bucket_cols=["k"], num_buckets=N_BUCKETS)
    mor = _run_all(
        spark,
        tmp_path,
        "mor",
        bucket_cols=["k"],
        num_buckets=N_BUCKETS,
        mode="mor",
    )
    assert _rows(spark, cow) == _expected()
    assert _rows(spark, mor) == _expected()
    # batch 0 bootstrapped the base; batches 1 and 2 are chain deltas
    chain = mor.current_chain()
    assert len(chain) == 2
    base_dir = mor.current_dir()
    assert VersionedTable._parse_dirname(os.path.basename(base_dir))[0] == 0
    # delta dirs are flat parquet (no bucket partitions) with _MANIFEST
    for d in chain:
        full = os.path.join(mor.path, d)
        assert os.path.exists(os.path.join(full, "_MANIFEST"))
        assert not any(n.startswith(f"{BUCKET_COL}=") for n in os.listdir(full))


def test_mor_replay_replaces_chain_entry(spark, tmp_path):
    """A replayed batch must REPLACE its own chain entry, not append a
    duplicate — the MOR form of the replay fixpoint."""
    table = _run_all(
        spark, tmp_path, "morreplay", bucket_cols=["k"], num_buckets=N_BUCKETS,
        mode="mor",
    )
    before = _rows(spark, table)
    chain_before = table.current_chain()
    sink = cdc_merge_sink(spark, table, ["k"], "__seq", op_col="__op", mode="mor")
    sink(_batches(spark)[2], 2)  # deliberate double-apply of batch 2
    chain_after = table.current_chain()
    assert len(chain_after) == len(chain_before)
    assert chain_after[:-1] == chain_before[:-1]
    assert chain_after[-1] != chain_before[-1]  # fresh dir, same slot
    assert _rows(spark, table) == before


def test_mor_fold_rebase_is_incremental_and_resets_chain(spark, tmp_path):
    """fold() merges the chain into a NEW base via the partition-pruned
    incremental publish: untouched buckets hard-link from the old base,
    the chain resets, and values are unchanged."""
    table = _run_all(
        spark, tmp_path, "morfold", bucket_cols=["k"], num_buckets=N_BUCKETS,
        mode="mor",
    )
    want = _rows(spark, table)
    old_base = table.current_dir()
    f_old = _bucket_files(old_base)
    folded = table.fold(spark)
    assert folded is not None
    assert table.current_chain() == []
    assert _rows(spark, table) == want
    new_base = table.current_dir()
    assert new_base != old_base
    f_new = _bucket_files(new_base)
    # chain keys: 1,2,3,40 — every bucket NOT containing them must be a
    # pure hard-link carry
    changed = {
        r[0]
        for r in spark.createDataFrame([(1,), (2,), (3,), (40,)], "k int")
        .select(F.pmod(F.hash("k"), F.lit(N_BUCKETS)).cast("int").alias("b"))
        .distinct()
        .collect()
    }
    carried = [b for b in f_new if b not in changed]
    assert carried
    for b in carried:
        assert f_new[b] == f_old[b]
    # a second fold is a no-op
    assert table.fold(spark) is None


def test_mor_fold_every_auto_rebases_in_stream(spark, tmp_path):
    table = _run_all(
        spark,
        tmp_path,
        "morauto",
        bucket_cols=["k"],
        num_buckets=N_BUCKETS,
        mode="mor",
        fold_every=2,
    )
    assert _rows(spark, table) == _expected()
    # batches 1,2 reached the chain; fold_every=2 re-based at batch 2
    assert table.current_chain() == []


def test_mor_time_travel_via_manifest(spark, tmp_path):
    """Each delta version dir snapshots (base, chain) in _MANIFEST:
    read(version=) reconstructs the state AS OF that delta."""
    table = _run_all(
        spark, tmp_path, "mortt", bucket_cols=["k"], num_buckets=N_BUCKETS,
        mode="mor",
    )
    # version 0 = bootstrap base (plain dir, no manifest)
    v0 = _rows(spark, table, version=0)
    assert v0 == {i: (f"v{i}", float(i)) for i in range(1, 30)}
    # version 1 = base + first delta (k=2 updated, 3 deleted, 40 added)
    v1 = _rows(spark, table, version=1)
    exp1 = {i: (f"v{i}", float(i)) for i in range(1, 30)}
    exp1[2] = ("v2b", 22.0)
    del exp1[3]
    exp1[40] = ("v40", 40.0)
    assert v1 == exp1
    # version 2 = live
    assert _rows(spark, table, version=2) == _expected()
    # vacuuming the chain away makes old MOR snapshots unresolvable
    table.fold(spark)
    table.vacuum(keep=1)
    assert table.read(spark, version=1) is None
    assert _rows(spark, table) == _expected()


def test_mor_vacuum_never_reclaims_live_chain(spark, tmp_path):
    table = _run_all(
        spark, tmp_path, "morvac", bucket_cols=["k"], num_buckets=N_BUCKETS,
        mode="mor",
    )
    want = _rows(spark, table)
    removed = table.vacuum(keep=1)
    # base + 2 chain dirs are ALL live; only superseded dirs removable
    live = {os.path.basename(table.current_dir()), *table.current_chain()}
    assert not live & set(removed)
    assert _rows(spark, table) == want


def test_mor_schema_checks(spark, tmp_path):
    """publish_delta fail-louds on schema drift (MOR chains keep one
    schema); mor+evolve is rejected at sink construction."""
    table = _run_all(
        spark, tmp_path, "morschema", bucket_cols=["k"], num_buckets=N_BUCKETS,
        mode="mor",
    )
    wide = spark.createDataFrame(
        [(2, "x", 1.0, "eu", 9, "U")],
        "k int, v string, amt double, region string, __seq int, __op string",
    )
    from ncpi_whistler_spark.operators.cdc import latest_change_per_key

    with pytest.raises(ValueError, match="schema"):
        table.publish_delta(latest_change_per_key(wide, ["k"], "__seq"), 9)
    with pytest.raises(ValueError, match="evolve"):
        cdc_merge_sink(
            spark, table, ["k"], "__seq", op_col="__op", mode="mor", evolve=True
        )


def test_mor_compact_versioned_folds_first(spark, tmp_path):
    """compact_versioned on a table with a live chain folds before
    compacting — values survive, chain gone, layout compacted."""
    from ncpi_whistler_spark.storage import compact_versioned

    table = _run_all(
        spark, tmp_path, "morcompact", bucket_cols=["k"], num_buckets=N_BUCKETS,
        mode="mor",
    )
    want = _rows(spark, table)
    compact_versioned(spark, table)
    assert table.current_chain() == []
    assert _rows(spark, table) == want


def test_vacuum_manifest_closure_keeps_retained_snapshot_resolvable(spark, tmp_path):
    """After a fold, vacuum(keep=2) retains the newest superseded dir —
    the last MOR delta. Its _MANIFEST references the OLD base and the
    earlier chain entries; the closure must pin those too, so the
    retained snapshot stays time-travel-resolvable instead of torn."""
    table = _run_all(
        spark, tmp_path, "morclosure", bucket_cols=["k"], num_buckets=N_BUCKETS,
        mode="mor",
    )
    live_before = _rows(spark, table)
    v2_snapshot = _rows(spark, table, version=2)
    table.fold(spark)
    table.vacuum(keep=2)
    # the kept delta's base+chain survived the vacuum via the closure
    assert _rows(spark, table, version=2) == v2_snapshot
    assert _rows(spark, table) == live_before
    # keep=1 releases the closure entirely
    table.vacuum(keep=1)
    assert table.read(spark, version=1) is None
    assert _rows(spark, table) == live_before
