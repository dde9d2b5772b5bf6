"""Storage-layout helpers: pruning + bucketed zero-exchange joins."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from ncpi_whistler_spark.storage import (
    enable_runtime_bloom_join,
    repartition_for_join,
    write_bucketed,
    write_partitioned,
)


def test_runtime_bloom_filter_join(spark):
    """A selective dim filter injects a runtime Bloom filter into the
    fact-side scan (might_contain over a bloom_filter_agg scalar
    subquery), and the filtered join returns exactly the unfiltered
    join's rows — shuffle-volume pruning with zero semantic change."""
    from tests.conftest import SF_DIR

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # local fixtures are tiny: drop the probe-side floor and force a
        # shuffle join so the test exercises the cluster-shaped plan
        enable_runtime_bloom_join(
            spark, application_side_scan_threshold="0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        dim = spark.read.parquet(f"{SF_DIR}/orders.parquet").where(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            fact.join(dim, fact.l_orderkey == dim.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt, opt
        assert "bloom_filter_agg" in opt, opt
        got = {(r["o_orderpriority"], r["n"]) for r in j.collect()}

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        plain = (
            fact.join(dim, fact.l_orderkey == dim.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert "might_contain" not in plain._jdf.queryExecution().optimizedPlan().toString()
        want = {(r["o_orderpriority"], r["n"]) for r in plain.collect()}
        assert got == want and got
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_write_partitioned_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)], "id long, grp string"
    )
    out = str(tmp_path / "part")
    write_partitioned(df, out, ["grp"])
    assert os.path.isdir(os.path.join(out, "grp=a"))
    back = spark.read.parquet(out).where(F.col("grp") == "a")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter reaches the scan — only grp=a files are listed
    assert back.count() == 50
    files = glob.glob(os.path.join(out, "grp=a", "*.parquet"))
    assert files
    _ = plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # tables land in ./spark-warehouse (gitignored); dropped in finally
    left = spark.createDataFrame([(i, i * 10) for i in range(1000)], "k long, v long")
    right = spark.createDataFrame([(i, i % 7) for i in range(1000)], "k long, w long")
    write_bucketed(left, "t_left", ["k"], num_buckets=8, sort_by=["k"])
    write_bucketed(right, "t_right", ["k"], num_buckets=8, sort_by=["k"])
    # disable broadcast so the join would otherwise shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_left").join(spark.table("t_right"), on="k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")


def test_repartition_for_join(spark):
    a = spark.createDataFrame([(1, "x")], "k long, a string")
    b = spark.createDataFrame([(1, "y")], "k long, b string")
    ra, rb = repartition_for_join(a, b, ["k"], partitions=4)
    assert ra.rdd.getNumPartitions() == 4
    assert rb.rdd.getNumPartitions() == 4


def test_range_sorted_files_are_disjoint(spark, tmp_path):
    from ncpi_whistler_spark.storage import write_range_sorted

    df = spark.createDataFrame(
        [((i * 37) % 1000, i) for i in range(1000)], "k long, v long"
    )
    out = str(tmp_path / "ranged")
    write_range_sorted(df, out, ["k"], partitions=8)
    back = spark.read.parquet(out)
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    ranges = sorted((r["lo"], r["hi"]) for r in per_file)
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_compact_parquet(spark, tmp_path):
    from ncpi_whistler_spark.storage import compact_parquet

    out = str(tmp_path / "many")
    df = spark.createDataFrame([(i, i % 5) for i in range(10_000)], "id long, g long")
    df.repartition(64).write.parquet(out)
    before = len(glob.glob(os.path.join(out, "*.parquet")))
    assert before >= 32
    after = compact_parquet(spark, out, target_file_mb=256)
    assert after < before
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(10_000))


def test_compact_versioned_no_reader_gap(spark, tmp_path):
    """Compaction through VersionedTable: a reader that resolved the
    pointer BEFORE the compaction finishes its scan on the old immutable
    directory (no rmtree/rename window at all), new readers see the
    compacted layout with identical values, and time travel still
    resolves the version id (highest publish sequence = compacted)."""
    from ncpi_whistler_spark.storage import compact_versioned
    from ncpi_whistler_spark.streaming.cdc import VersionedTable

    t = VersionedTable(str(tmp_path / "vt"))
    df = spark.createDataFrame([(i, i % 5) for i in range(10_000)], "id long, g long")
    t.publish(df.repartition(64), 7)
    before = len(glob.glob(os.path.join(t.current_dir(), "*.parquet")))
    assert before >= 32

    # reader resolves the pointer pre-compaction...
    old_reader = t.read(spark)
    after = compact_versioned(spark, t, target_file_mb=256)
    assert after < before
    # ...and still completes against the old directory afterwards
    assert old_reader.count() == 10_000
    back = t.read(spark)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(10_000))
    # same logical version, compacted layout wins the time-travel read
    assert t.versions() == [7]
    assert t.current_version() == 7
    assert t.read(spark, version=7).count() == 10_000
    # vacuum reclaims the pre-compaction directory, live one intact
    t.vacuum(keep=1)
    assert t.read(spark).count() == 10_000


def test_compact_versioned_preserves_bucket_layout(spark, tmp_path):
    """Compacting a bucketed table keeps the __bucket directory layout
    (the pruning unit) while collapsing per-bucket small files."""
    from ncpi_whistler_spark.storage import compact_versioned
    from ncpi_whistler_spark.streaming.cdc import BUCKET_COL, VersionedTable

    t = VersionedTable(str(tmp_path / "bvt"), bucket_cols=["id"], num_buckets=4)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(4_000)], "id long, v string")
    t.publish(df.repartition(32), 0)
    # the engine's own publishes are already one-file-per-bucket (write
    # repartitions on the bucket id); fragment the current version the
    # way a foreign writer would, to give compaction something to do
    from pyspark.sql import functions as F2

    cur = t.current_dir()
    (
        df.withColumn("__bucket", F2.pmod(F2.hash("id"), F2.lit(4)).cast("int"))
        .repartition(32)
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(cur + "_frag")
    )
    import shutil

    shutil.rmtree(cur)
    os.rename(cur + "_frag", cur)
    open(os.path.join(cur, "_COMMITTED"), "w").close()
    files_before = len(
        glob.glob(os.path.join(cur, "**", "*.parquet"), recursive=True)
    )
    assert files_before > 4
    files_after = compact_versioned(spark, t)
    assert files_after < files_before
    assert files_after <= 8  # ~one file per bucket
    buckets = {
        d
        for d in os.listdir(t.current_dir())
        if d.startswith(f"{BUCKET_COL}=")
    }
    assert buckets == {f"{BUCKET_COL}={i}" for i in range(4)}
    back = t.read(spark)
    assert back.count() == 4_000 and BUCKET_COL not in back.columns
    # bucket pruning still works on the compacted layout
    sub = t.read_buckets(spark, [1])
    assert 0 < sub.count() < 4_000


def test_zorder_prunes_second_dimension(spark, tmp_path):
    """For a filter on the SECOND clustering column, the Z-ordered layout
    must have strictly fewer files intersecting the predicate range than
    the lexicographic layout (where every file spans all of y)."""
    from ncpi_whistler_spark.storage import write_range_sorted, write_zordered

    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")

    def files_overlapping_y(path, lo, hi):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
            .collect()
        )
        return len(per_file), sum(1 for r in per_file if r["hi"] >= lo and r["lo"] <= hi)

    lin = str(tmp_path / "linear")
    zor = str(tmp_path / "zorder")
    write_range_sorted(df, lin, ["x", "y"], partitions=16)
    write_zordered(df, zor, ["x", "y"], bits=6, partitions=16)
    n_lin, hit_lin = files_overlapping_y(lin, 0, 7)
    n_zor, hit_zor = files_overlapping_y(zor, 0, 7)
    assert n_lin >= 8 and n_zor >= 8
    assert hit_lin == n_lin  # linear: every file spans all of y
    assert hit_zor < n_zor, (hit_zor, n_zor)
    # both layouts return identical data
    got = spark.read.parquet(zor).where((F.col("y") >= 0) & (F.col("y") <= 7)).count()
    assert got == 64 * 8


def test_zorder_key_bijective_on_grid(spark):
    """Distinct (x, y) points must map to distinct Morton keys (the key
    is a bijection on [0, 2^bits)^2 — any collision would silently merge
    clustering cells)."""
    from ncpi_whistler_spark.storage import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )
    n = df.select(zorder_key(["x", "y"], bits=6).alias("z")).distinct().count()
    assert n == 64 * 64


def test_compaction_reclustering_enables_file_skipping(spark, tmp_path):
    """The compaction -> skipping payoff chain: on a hash-scattered
    layout every file spans the whole key range, so manifest stats can
    prove nothing and read(where=) must scan everything; a
    compact_versioned(sort_by=...) re-cluster gives files disjoint
    ranges, publish regenerates the footer stats, and the SAME query
    now prunes — layout, not the predicate, is what makes min/max
    selective (the sort/Z-order argument, measured on the table)."""
    from ncpi_whistler_spark.storage import compact_versioned
    from ncpi_whistler_spark.streaming.cdc import VersionedTable

    path = str(tmp_path / "recluster")
    t = VersionedTable(path, stats_cols=["k"])
    # high-entropy pad so parquet cannot compress the files away (a
    # constant pad RLE-compresses to ~nothing and compaction would
    # coalesce to a single file, voiding the demonstration)
    pad = F.concat(
        *[F.md5(F.concat(F.col("id").cast("string"), F.lit(i))) for i in range(16)]
    ).alias("pad")
    df = spark.range(50000).select(
        F.col("id").cast("int").alias("k"), pad
    )
    t.publish(df.repartition(8), 0)  # hash layout: all files span all k
    full = t.read(spark)
    n_files_full = len(full.inputFiles())
    assert n_files_full >= 8
    where = {"k": (0, 999)}
    unclustered = t.read(spark, where=where)
    assert len(unclustered.inputFiles()) == n_files_full  # stats can't help
    want = sorted(r["k"] for r in unclustered.collect())

    compact_versioned(spark, t, target_file_mb=1, sort_by=["k"])
    live = t.read(spark)
    n_files_live = len(live.inputFiles())
    assert n_files_live > 1  # multiple right-sized files survive
    pruned = t.read(spark, where=where)
    assert len(pruned.inputFiles()) < n_files_live  # NOW it prunes
    assert sorted(r["k"] for r in pruned.collect()) == want  # hash-equal
