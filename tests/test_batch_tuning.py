"""spread_small_input: scale-adaptive input spreading for Arrow-UDF-heavy
batch operators (operators/tuning.py) — the r12 optimization that stops a
single-file fixture from serializing the vector pipelines onto one core.
"""

import os

import pytest
from pyspark.sql import functions as F

from ncpi_whistler_spark.operators.tuning import (
    VECTOR_TARGET_BYTES,
    _parse_bytes,
    spread_small_input,
)


@pytest.fixture(scope="module")
def small_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("spread") / "t.parquet")
    spark.range(2000).select(
        F.col("id"), F.expr("array_repeat(cast(id as double), 64)").alias("v")
    ).coalesce(1).write.parquet(p)
    return p


def test_small_single_file_input_is_spread(spark, small_parquet):
    df = spark.read.parquet(small_parquet)
    # explicit sub-file target: the RLE-compressed fixture is tiny, and
    # the test pins the mechanics, not the production default
    out = spread_small_input(df, target_bytes=1024)
    n = out.rdd.getNumPartitions()
    par = spark.sparkContext.defaultParallelism
    assert 1 < n <= par
    # values untouched, only placement
    assert out.exceptAll(df).count() == 0 and df.exceptAll(out).count() == 0


def test_wide_enough_input_passes_through(spark, small_parquet):
    df = spark.read.parquet(small_parquet)
    # a tiny maxPartitionBytes makes the scan layout estimate already
    # meet the target -> identical frame back, no repartition node
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
    try:
        assert spread_small_input(df) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_large_target_bytes_means_no_op(spark, small_parquet):
    df = spark.read.parquet(small_parquet)
    # one partition suffices for the whole input at this target
    assert spread_small_input(df, target_bytes=1 << 30) is df


def test_non_file_backed_frame_passes_through(spark):
    df = spark.range(10).groupBy((F.col("id") % 3).alias("k")).count()
    assert spread_small_input(df) is df


def test_env_override_wins(spark, small_parquet, monkeypatch):
    df = spark.read.parquet(small_parquet)
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_PARTITIONS", "3")
    assert spread_small_input(df).rdd.getNumPartitions() == 3


def test_parse_bytes_units():
    assert _parse_bytes("128m", 0) == 128 << 20
    assert _parse_bytes("134217728b", 0) == 128 << 20
    assert _parse_bytes("1g", 0) == 1 << 30
    assert _parse_bytes("weird", 42) == 42
    assert VECTOR_TARGET_BYTES == 128 << 10


def test_materialize_shared_is_a_barrier_with_identical_rows(spark):
    """materialize_shared (r13): the returned frame scans checkpointed
    blocks (no upstream re-execution per consumer — the executed plan
    has no Exchange/Window from the original pipeline) and rows are
    identical; SPARK_GRAFT_SHARED_MODE=persist restores the r12 lazy
    cache (the A/B hook)."""
    from ncpi_whistler_spark.operators.tuning import materialize_shared

    src = (
        spark.range(500)
        .select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    cut = materialize_shared(src)
    plan = cut._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan and "Exchange" not in plan
    assert sorted(map(tuple, cut.collect())) == sorted(map(tuple, src.collect()))


def test_materialize_shared_env_hook_restores_lazy_persist(spark, monkeypatch):
    from ncpi_whistler_spark.operators.tuning import materialize_shared

    monkeypatch.setenv("SPARK_GRAFT_SHARED_MODE", "persist")
    src = spark.range(100).select(F.col("id").alias("k"))
    cut = materialize_shared(src)
    try:
        assert cut.storageLevel.useMemory  # persisted, not checkpointed
        assert cut.count() == 100
    finally:
        cut.unpersist()


def test_single_jvm_master_classifier():
    """materialize_shared only localCheckpoints where an executor can
    never be lost; every multi-JVM master takes the persist+eager-count
    barrier (lineage retained — the faultinject cluster suite SIGKILLs
    executors and must recover)."""
    from ncpi_whistler_spark.operators.tuning import _single_jvm_master

    for m in ("local", "local[4]", "local[*]", "local[4,2]"):
        assert _single_jvm_master(m), m
    for m in ("local-cluster[2,1,1024]", "spark://host:7077", "yarn",
              "k8s://https://host:443", ""):
        assert not _single_jvm_master(m), m
