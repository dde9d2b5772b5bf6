"""Streaming CDC apply: versioned-table publish + replay-idempotent
foreachBatch merge (streaming/cdc.py)."""

from __future__ import annotations

import os

from ncpi_whistler_spark.streaming.cdc import (
    VersionedTable,
    cdc_merge_sink,
    run_cdc_stream,
)

SCHEMA = "k int, v string, amt double, __seq int, __op string"


def _batches(spark):
    b1 = spark.createDataFrame(
        [(i, f"v{i}", float(i), 1, "I") for i in range(1, 6)], SCHEMA
    )
    b2 = spark.createDataFrame(
        [(2, "v2b", 22.0, 2, "U"), (3, "x", 0.0, 2, "D"), (6, "v6", 6.0, 2, "I")],
        SCHEMA,
    )
    b3 = spark.createDataFrame(
        [(6, "v6c", 66.0, 3, "U"), (1, "x", 0.0, 3, "D"), (3, "v3back", 33.0, 3, "U")],
        SCHEMA,
    )
    return [b1, b2, b3]


EXPECTED = {
    2: ("v2b", 22.0),
    3: ("v3back", 33.0),  # deleted in b2, re-upserted in b3
    4: ("v4", 4.0),
    5: ("v5", 5.0),
    6: ("v6c", 66.0),
}  # k=1 deleted in b3


def _table_rows(spark, table):
    df = table.read(spark)
    return {r["k"]: (r["v"], r["amt"]) for r in df.collect()}


def _run_all(spark, tmp_path, name="t"):
    src = str(tmp_path / f"{name}_src")
    tbl = str(tmp_path / f"{name}_table")
    os.makedirs(src, exist_ok=True)
    table = None
    for b in _batches(spark):
        # one staged file per round; each round is a NEW query recovering
        # from the shared checkpoint (full restart boundary)
        b.coalesce(1).write.mode("append").parquet(src)
        table = run_cdc_stream(
            spark, src, SCHEMA, tbl, keys=["k"], seq_col="__seq", op_col="__op"
        )
    return table


def test_stream_merge_across_restarts_equals_expected(spark, tmp_path):
    table = _run_all(spark, tmp_path)
    assert _table_rows(spark, table) == EXPECTED
    # three micro-batches across three restarted queries: the shared
    # checkpoint kept numbering them 0,1,2 (no source rows re-read)
    assert table.current_version() == 2


def test_replayed_batch_is_a_fixpoint(spark, tmp_path):
    """A crash between publish and offset-commit replays the last batch
    against a base that already absorbed it; the merge must converge."""
    table = _run_all(spark, tmp_path, "replay")
    before = _table_rows(spark, table)
    sink = cdc_merge_sink(spark, table, ["k"], "__seq", op_col="__op")
    sink(_batches(spark)[2], 2)  # deliberate double-apply of batch 2
    assert _table_rows(spark, table) == before
    assert table.current_version() == 2


def test_torn_publish_leaves_previous_version_live(spark, tmp_path):
    table = _run_all(spark, tmp_path, "torn")
    want = _table_rows(spark, table)
    # simulate a crash mid-publish: the version directory exists but the
    # pointer was never moved — readers must not see it
    junk = _batches(spark)[0].select("k", "v", "amt")
    junk.write.mode("overwrite").parquet(os.path.join(table.path, "v=99-orphan"))
    assert table.current_version() == 2
    assert _table_rows(spark, table) == want
    # vacuum reclaims the orphan and superseded versions, never the live one
    removed = table.vacuum(keep=1)
    assert "v=99-orphan" in removed
    assert _table_rows(spark, table) == want
    left = [d for d in os.listdir(table.path) if d.startswith("v=")]
    assert len(left) == 1


def test_first_batch_bootstraps_empty_table(spark, tmp_path):
    src = str(tmp_path / "boot_src")
    tbl = str(tmp_path / "boot_table")
    os.makedirs(src, exist_ok=True)
    _batches(spark)[0].coalesce(1).write.mode("append").parquet(src)
    table = run_cdc_stream(
        spark, src, SCHEMA, tbl, keys=["k"], seq_col="__seq", op_col="__op"
    )
    assert _table_rows(spark, table) == {
        i: (f"v{i}", float(i)) for i in range(1, 6)
    }
    df = table.read(spark)
    assert set(df.columns) == {"k", "v", "amt"}  # seq/op stripped


def test_versioned_table_pointer_is_atomic_unit(tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    assert t.current_version() is None
    with open(t._pointer, "w") as fh:
        fh.write("not-an-int")
    assert t.current_version() is None  # garbage pointer = no table


def test_time_travel_reads_retained_versions(spark, tmp_path):
    """Every retained version is readable by id; version -1 is the
    bootstrap-free first batch here, and vacuumed versions read None."""
    table = _run_all(spark, tmp_path, "tt")
    assert table.versions() == [0, 1, 2]
    # version 0 = after batch 1 only: inserts k=1..5, no deletes yet
    v0 = {r["k"]: r["v"] for r in table.read(spark, version=0).collect()}
    assert v0 == {i: f"v{i}" for i in range(1, 6)}
    # version 1 = after batch 2: k=2 updated, k=3 deleted, k=6 inserted
    v1 = {r["k"]: r["v"] for r in table.read(spark, version=1).collect()}
    assert v1 == {1: "v1", 2: "v2b", 4: "v4", 5: "v5", 6: "v6"}
    # current == version 2
    assert _table_rows(spark, table) == EXPECTED
    assert table.read(spark, version=7) is None
    table.vacuum(keep=1)
    assert table.read(spark, version=0) is None  # vacuumed away
    assert _table_rows(spark, table) == EXPECTED  # live version intact


def test_negative_bootstrap_version_listed_and_readable(spark, tmp_path):
    """versions() must parse negative ids (the bootstrap convention is
    version -1; the dirname token is stripped from the right)."""
    t = VersionedTable(str(tmp_path / "nv"))
    t.publish(spark.createDataFrame([(1, "a")], "k int, v string"), -1)
    assert t.versions() == [-1]
    assert t.current_version() == -1
    got = t.read(spark, version=-1).collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "a")]
