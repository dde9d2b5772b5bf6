"""CDC operators: change-log compaction, MERGE upsert/delete, SCD2.

Semantics pinned on tiny hand-checkable frames; plan shapes locked so
the scale story (argmax compaction = partial agg not window; broadcast
anti join leaves the base unshuffled) cannot silently regress.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ncpi_whistler_spark.operators.cdc import (
    latest_change_per_key,
    merge_upsert,
    scd2_history,
)


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, v string, amt double",
    )


def _delta(spark):
    # k=1: two updates, seq 2 wins; k=2: delete; k=9: insert (two
    # versions, seq 5 wins); k=3 untouched.
    return spark.createDataFrame(
        [
            (1, "a1", 11.0, 1, "U"),
            (1, "a2", 12.0, 2, "U"),
            (2, "b", 20.0, 1, "D"),
            (9, "zz", 90.0, 4, "I"),
            (9, "z2", 99.0, 5, "U"),
        ],
        "k int, v string, amt double, __seq int, __op string",
    )


def test_latest_change_per_key_argmax(spark):
    got = {
        r["k"]: (r["v"], r["__seq"])
        for r in latest_change_per_key(_delta(spark), ["k"], "__seq").collect()
    }
    assert got == {1: ("a2", 2), 2: ("b", 1), 9: ("z2", 5)}


def test_latest_change_tiebreaker_total_order(spark):
    d = spark.createDataFrame(
        [(1, "x", 1, "U"), (1, "y", 1, "U")],
        "k int, v string, __seq int, __op string",
    )
    got = latest_change_per_key(d, ["k"], "__seq", tiebreakers=["v"]).collect()
    assert len(got) == 1 and got[0]["v"] == "y"


def test_merge_upsert_semantics(spark):
    out = merge_upsert(
        _base(spark), _delta(spark), keys=["k"], seq_col="__seq", op_col="__op"
    )
    assert out.columns == _base(spark).columns  # schema = base exactly
    rows = {r["k"]: (r["v"], r["amt"]) for r in out.collect()}
    assert rows == {
        1: ("a2", 12.0),  # latest update wins
        3: ("c", 30.0),  # untouched base row
        9: ("z2", 99.0),  # insert, latest version
    }  # k=2 deleted


def test_merge_upsert_delete_wins_when_latest(spark):
    d = spark.createDataFrame(
        [(3, "c9", 31.0, 1, "U"), (3, "c", 30.0, 2, "D")],
        "k int, v string, amt double, __seq int, __op string",
    )
    out = merge_upsert(_base(spark), d, ["k"], "__seq", op_col="__op")
    assert sorted(r["k"] for r in out.collect()) == [1, 2]


def test_merge_without_op_col_is_pure_upsert(spark):
    d = spark.createDataFrame(
        [(2, "B", 21.0, 1)], "k int, v string, amt double, __seq int"
    )
    out = merge_upsert(_base(spark), d, ["k"], "__seq")  # no op_col: upsert only
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows[2] == "B" and set(rows) == {1, 2, 3}


def test_merge_extra_delta_column_fails_loud_unless_evolve(spark):
    """A delta column the base lacks is a schema CHANGE: silent dropping
    (the pre-r10 behavior) hides a widened feed; default is a loud
    error, and evolve=True widens the base with NULL backfill."""
    import pytest

    d = spark.createDataFrame(
        [(2, "B", 21.0, "eu", 1, "U")],
        "k int, v string, amt double, region string, __seq int, __op string",
    )
    with pytest.raises(ValueError, match="region"):
        merge_upsert(_base(spark), d, ["k"], "__seq", op_col="__op")
    out = merge_upsert(
        _base(spark), d, ["k"], "__seq", op_col="__op", evolve=True
    )
    assert out.columns == ["k", "v", "amt", "region"]
    rows = {r["k"]: (r["v"], r["region"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("B", "eu"), 3: ("c", None)}


def test_merge_missing_base_column_still_fails(spark):
    """evolve widens, never narrows: a delta MISSING a base column is an
    error either way (select(*base.columns) cannot resolve it)."""
    import pytest

    d = spark.createDataFrame([(2, 1, "U")], "k int, __seq int, __op string")
    for ev in (False, True):
        with pytest.raises(Exception):
            merge_upsert(
                _base(spark), d, ["k"], "__seq", op_col="__op", evolve=ev
            ).collect()


def test_compaction_is_partial_agg_not_window(spark):
    """The compaction must be an aggregate (map-side combinable) — a
    row_number window here would shuffle and sort every version of every
    key at 100 TB."""
    plan = (
        latest_change_per_key(_delta(spark), ["k"], "__seq")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert re.search(r"HashAggregate|ObjectHashAggregate|SortAggregate", plan)


def test_broadcast_delta_leaves_base_unshuffled(spark, tmp_path):
    base_path = str(tmp_path / "base.parquet")
    _base(spark).write.parquet(base_path)
    base = spark.read.parquet(base_path)
    out = merge_upsert(
        base,
        _delta(spark),
        ["k"],
        "__seq",
        op_col="__op",
        broadcast_delta=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the anti-join side of the union must not exchange the base scan
    anti_section = plan.split("Union")[0]
    assert not re.search(
        r"(?<!Broadcast)Exchange hashpartitioning", anti_section.split("BroadcastHashJoin")[0]
    )
    # end-to-end values still correct through the parquet round-trip
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows == {1: "a2", 3: "c", 9: "z2"}


def test_scd2_history_versions(spark):
    ch = spark.createDataFrame(
        [(1, 0, "a"), (1, 2, "b"), (1, 5, "c"), (7, 3, "x")],
        "k int, seq int, v string",
    )
    out = scd2_history(ch, ["k"], "seq").collect()
    got = {
        (r["k"], r["seq"]): (r["valid_from_seq"], r["valid_to_seq"], r["is_current"])
        for r in out
    }
    assert got == {
        (1, 0): (0, 2, False),
        (1, 2): (2, 5, False),
        (1, 5): (5, None, True),
        (7, 3): (3, None, True),
    }


def test_merge_empty_delta_is_identity(spark):
    d = _delta(spark).where(F.lit(False))
    out = merge_upsert(_base(spark), d, ["k"], "__seq", op_col="__op")
    assert sorted((r["k"], r["v"]) for r in out.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]


def test_merge_empty_base_takes_inserts(spark):
    b = _base(spark).where(F.lit(False))
    out = merge_upsert(b, _delta(spark), ["k"], "__seq", op_col="__op")
    assert sorted(r["k"] for r in out.collect()) == [1, 9]


def test_cdcbench_plan_claims_hold_at_ci_scale():
    """The CDC scale-evidence tool's gates (map-side-combined compaction
    shuffle, WindowGroupLimit equivalence, static broadcast anti join,
    delta-scale merge shuffle, bit-equal A/B results) hold at sf0.01."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "tools.cdcbench", "--sf-dir", "/root/testdata/sf0.01"],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    report = json.loads(line)
    assert report["ok"] is True
    assert report["compaction_verdict"]["map_side_combine_real"]
    assert report["merge"]["hinted_plan_static_broadcast"]
    for v, entry in report["compaction_sweep"].items():
        assert entry["hash_equal"], v


def test_merge_null_key_rows_pass_through(spark):
    """NULL merge keys: a NULL-keyed delta row can never match a base row
    (SQL join semantics — NULL != NULL), so it flows through as an
    insert; NULL-keyed base rows are never considered 'changed'. Pinned
    because both Spark left_anti and the DuckDB NOT EXISTS oracle share
    this semantic and a null-safe-equality refactor would silently
    change it."""
    b = spark.createDataFrame(
        [(None, "nb", 1.0), (1, "a", 10.0)], "k int, v string, amt double"
    )
    d = spark.createDataFrame(
        [(None, "nd", 2.0, 1, "U"), (1, "a2", 11.0, 1, "U")],
        "k int, v string, amt double, __seq int, __op string",
    )
    out = merge_upsert(b, d, ["k"], "__seq", op_col="__op")
    rows = sorted((r["k"], r["v"]) for r in out.collect() if r["k"] is not None)
    nulls = sorted(r["v"] for r in out.collect() if r["k"] is None)
    assert rows == [(1, "a2")]
    assert nulls == ["nb", "nd"]  # base NULL kept, delta NULL inserted


def test_map_typed_payload_uses_max_by_fallback(spark):
    """Spark cannot order structs containing MapType, so the argmax
    compaction (and therefore merge) would raise INVALID_ORDERING_TYPE
    on any table with a map column; the max_by fallback keeps CDC total
    over such schemas."""
    d = spark.createDataFrame(
        [
            (1, {"a": "old"}, 1, "U"),
            (1, {"a": "new"}, 2, "U"),
            (2, {"b": "x"}, 1, "U"),
        ],
        "k int, props map<string,string>, __seq int, __op string",
    )
    got = {
        r["k"]: (dict(r["props"]), r["__seq"])
        for r in latest_change_per_key(d, ["k"], "__seq").collect()
    }
    assert got == {1: ({"a": "new"}, 2), 2: ({"b": "x"}, 1)}
    b = spark.createDataFrame([(1, {"a": "base"}), (3, {"c": "z"})], "k int, props map<string,string>")
    out = merge_upsert(b, d, ["k"], "__seq", op_col="__op")
    rows = {r["k"]: dict(r["props"]) for r in out.collect()}
    assert rows == {1: {"a": "new"}, 2: {"b": "x"}, 3: {"c": "z"}}


def test_map_fallback_seq_tie_broken_by_orderable_columns(spark):
    """The max_by fallback's ordering struct extends (seq, tiebreakers)
    with every ORDERABLE payload column, so a seq tie between rows whose
    orderable part differs is still deterministic — even with no
    explicit tiebreakers. Only rows identical in ALL orderable columns
    and differing solely inside a map stay scheduler-arbitrary."""
    d = spark.createDataFrame(
        [
            (1, "alpha", {"m": "x"}, 1, "U"),
            (1, "zeta", {"m": "y"}, 1, "U"),  # same seq; 'zeta' > 'alpha'
        ],
        "k int, v string, props map<string,string>, __seq int, __op string",
    )
    for _ in range(3):  # repeated runs: same winner every time
        got = latest_change_per_key(
            d.repartition(8), ["k"], "__seq"
        ).collect()
        assert len(got) == 1
        assert got[0]["v"] == "zeta"
        assert dict(got[0]["props"]) == {"m": "y"}


def test_table_diff_semantics_and_roundtrip(spark):
    """table_diff emits exactly the I/U/D rows between snapshots
    (unchanged keys drop out; NULL payload flips are real updates via
    eqNullSafe; NULL keys never match so they surface as D+I), and
    applying the emitted feed to the old snapshot via merge_upsert
    reconstructs the new snapshot exactly — CDC out then in is the
    identity."""
    from ncpi_whistler_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [
            (1, "a", 10.0),      # unchanged
            (2, "b", 20.0),      # updated value
            (3, "c", None),      # NULL -> non-NULL: update
            (4, "d", 40.0),      # deleted
            (None, "nk", 0.0),   # NULL key: join-semantics D
        ],
        "k int, v string, amt double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b2", 21.0),
            (3, "c", 33.0),
            (5, "e", 50.0),      # inserted
            (None, "nk2", 0.0),  # NULL key: join-semantics I
        ],
        "k int, v string, amt double",
    )
    d = table_diff(old, new, keys=["k"])
    got = {(r["k"], r["change_op"]): (r["v"], r["amt"]) for r in d.collect()}
    assert got == {
        (2, "U"): ("b2", 21.0),
        (3, "U"): ("c", 33.0),
        (4, "D"): ("d", 40.0),
        (5, "I"): ("e", 50.0),
        (None, "D"): ("nk", 0.0),
        (None, "I"): ("nk2", 0.0),
    }
    # round-trip: old + emitted feed == new (non-NULL keys; NULL keys
    # are pass-through by documented merge semantics)
    feed = d.withColumn("__seq", F.lit(1))
    back = merge_upsert(
        old.where(F.col("k").isNotNull()),
        feed.where(F.col("k").isNotNull()),
        keys=["k"],
        seq_col="__seq",
        op_col="change_op",
        delete_op="D",
    )
    want = sorted(
        (r["k"], r["v"], r["amt"])
        for r in new.where(F.col("k").isNotNull()).collect()
    )
    assert sorted((r["k"], r["v"], r["amt"]) for r in back.collect()) == want


def test_table_diff_compare_cols_ignores_volatile(spark):
    from ncpi_whistler_spark.operators.cdc import table_diff

    old = spark.createDataFrame([(1, "a", 100)], "k int, v string, mtime int")
    new = spark.createDataFrame([(1, "a", 999)], "k int, v string, mtime int")
    assert table_diff(old, new, ["k"]).count() == 1  # mtime counts by default
    assert table_diff(old, new, ["k"], compare_cols=["v"]).count() == 0


def test_table_diff_plan_single_join_no_window(spark):
    from ncpi_whistler_spark.operators.cdc import table_diff

    old = spark.createDataFrame([(1, "a")], "k int, v string")
    new = spark.createDataFrame([(1, "b")], "k int, v string")
    plan = (
        table_diff(old, new, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan and "CartesianProduct" not in plan
    assert plan.count("Join") >= 1


def test_versioned_table_diff_between_versions(spark, tmp_path):
    """VersionedTable.diff = the change feed a downstream consumer
    replays between retained versions, keys from the persisted spec."""
    from ncpi_whistler_spark.streaming.cdc import VersionedTable, cdc_merge_sink

    t = VersionedTable(str(tmp_path / "cdf"), bucket_cols=["k"], num_buckets=4)
    sink = cdc_merge_sink(spark, t, ["k"], "__seq", op_col="__op")
    b1 = spark.createDataFrame(
        [(1, "a", 1.0, 1, "I"), (2, "b", 2.0, 1, "I")],
        "k int, v string, amt double, __seq int, __op string",
    )
    b2 = spark.createDataFrame(
        [(2, "b2", 22.0, 2, "U"), (1, "x", 0.0, 2, "D"), (3, "c", 3.0, 2, "I")],
        "k int, v string, amt double, __seq int, __op string",
    )
    sink(b1, 0)
    t.set_merge_spec(["k"], "__seq", "__op")
    sink(b2, 1)
    d = t.diff(spark, 0, 1)
    got = {(r["k"], r["change_op"]): r["v"] for r in d.collect()}
    assert got == {(1, "D"): "a", (2, "U"): "b2", (3, "I"): "c"}
    assert t.diff(spark, 0, 99) is None
