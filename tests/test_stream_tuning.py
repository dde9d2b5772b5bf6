"""Round-12 optimization: scale-adaptive streaming state partitioning
(streaming/tuning.py). The helper must (a) never RAISE the partition
count above the session value, (b) derive ceil(bytes/target) for small
sources, (c) honor the env override, and (d) restore the session conf
on exit — including on error."""

from __future__ import annotations

import os

import pytest

from ncpi_whistler_spark.streaming.tuning import (
    _KEY,
    adaptive_stream_partitions,
    dir_bytes,
    stream_partitions,
)


def test_dir_bytes_counts_data_files_only(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x" * 1000)
    (d / "_SUCCESS").write_bytes(b"meta")
    (d / ".hidden").write_bytes(b"y" * 999)
    sub = d / "nested"
    sub.mkdir()
    (sub / "part-1.parquet").write_bytes(b"z" * 500)
    assert dir_bytes(str(d)) == 1500
    # single plain file (the driver's events.parquet layout)
    f = tmp_path / "one.parquet"
    f.write_bytes(b"a" * 123)
    assert dir_bytes(str(f)) == 123
    # remote/unknown paths -> None (caller keeps the session value)
    assert dir_bytes("s3a://bucket/x") is None
    assert dir_bytes("") is None


def test_adaptive_clamps_to_session_value(spark):
    cur = int(spark.conf.get(_KEY))
    # huge source: never raises above the session value
    assert adaptive_stream_partitions(spark, 10**15) == cur
    # unknown size: unchanged
    assert adaptive_stream_partitions(spark, None) == cur
    # tiny source: sheds down to ceil(bytes/target), floor 1
    assert adaptive_stream_partitions(spark, 1) == 1
    assert (
        adaptive_stream_partitions(spark, 64 << 20, target_bytes=32 << 20)
        == min(cur, 2)
    )
    # denser target for Python-side stateful ops
    assert adaptive_stream_partitions(
        spark, 2 << 20, target_bytes=256 << 10
    ) == min(cur, 8)


def test_env_override_wins(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTITIONS", "5")
    assert adaptive_stream_partitions(spark, 1) == 5
    assert adaptive_stream_partitions(spark, None) == 5


def test_stream_partitions_sets_and_restores(spark):
    prev = spark.conf.get(_KEY)
    with stream_partitions(spark, 1):
        assert spark.conf.get(_KEY) == "1"
    assert spark.conf.get(_KEY) == prev
    # restores on error too
    with pytest.raises(RuntimeError):
        with stream_partitions(spark, 1):
            raise RuntimeError("boom")
    assert spark.conf.get(_KEY) == prev
