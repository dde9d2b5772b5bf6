"""Storage-layout helpers: the physical-design half of 100 TB performance.

Shuffles are the scale bottleneck; layout is how you delete them ahead of
time:

- **Partitioned writes** (`write_partitioned`) — coarse pruning columns
  (date, module, resourceType, lang, bucket id): queries filtering on them
  skip whole directories (partition pruning), and ``maxRecordsPerFile``
  bounds file sizes for the scan parallelism you want.
- **Bucketed tables** (`write_bucketed`) — pre-shuffled layout on a join/
  agg key: two tables bucketed the same way join with ZERO exchange
  (Catalyst sees the bucketing and drops the shuffle). The right choice
  for repeatedly-joined fact tables (orders⋈lineitem on orderkey) and for
  the dedup inverted indexes keyed by doc id.
- **Sort within buckets** — gives merge-friendly runs and better
  min/max pruning inside files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Partition-pruned parquet layout. Keep partition cardinality in the
    hundreds-to-thousands; high-cardinality keys belong in bucketing."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    num_buckets: int = 64,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (metastore-backed). Joins/aggregations on
    ``bucket_by`` between tables with identical bucketing skip the
    exchange entirely — pre-paying one shuffle at write time for zero at
    read time. ``num_buckets`` should be ≥ the target parallelism and
    stable across every table that joins on the key."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table_name)


def enable_runtime_bloom_join(
    spark,
    application_side_scan_threshold: str = "10GB",
    creation_side_threshold: str = "50MB",
) -> None:
    """Turn on Catalyst's runtime Bloom-filter join pruning and size its
    thresholds for the deployment.

    When a join's build side carries a selective filter, the optimizer
    plans a ``bloom_filter_agg`` over the build-side join keys and
    injects ``might_contain(<bloom>, xxhash64(key))`` into the probe-side
    SCAN as a runtime filter — probe rows whose keys cannot match are
    dropped before the shuffle, so at 100 TB the exchange moves only the
    ~selectivity fraction of the fact table instead of all of it. This
    composes with (does not replace) bucketing: bucketing removes the
    exchange for co-bucketed keys, the Bloom filter removes ROWS for
    everything else.

    ``application_side_scan_threshold`` is the minimum probe-side scan
    size before injection pays for itself (Spark's default 10GB is right
    for clusters; tests drop it to 0). The build side must stay under
    ``creation_side_threshold`` — the Bloom bitmap is built in one
    aggregate and shipped as a scalar subquery to every scan task.
    Verified by tests/test_storage.py::test_runtime_bloom_filter_join.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        application_side_scan_threshold,
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_side_threshold,
    )


def repartition_for_join(
    left: DataFrame, right: DataFrame, on: list[str], partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Co-partition both sides of a repeated join on its key so the
    exchange happens once and downstream stages reuse it (useful when the
    same keyed pair feeds several joins/aggregations in one job)."""
    n = partitions or left.sparkSession.conf.get("spark.sql.shuffle.partitions")
    n = int(n)
    return (
        left.repartition(n, *on),
        right.repartition(n, *on),
    )


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_by: list[str],
    partitions: int | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Linear clustering for range predicates (the data-skipping
    complement to hash bucketing): range-repartition on the sort keys,
    sort within partitions, write. Every file then covers one narrow,
    non-overlapping key range, so parquet footer min/max statistics prune
    whole files for ``BETWEEN``/``>=`` filters — at 100 TB a date-range
    query reads only the files whose range intersects the predicate.

    For multi-column ``sort_by`` the clustering is lexicographic (leading
    column dominates) — put the most-filtered column first."""
    n = partitions
    if n is None:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (
        df.repartitionByRange(n, *sort_by)
        .sortWithinPartitions(*sort_by)
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 256,
    sort_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    roughly ``target_file_mb`` (the 100 TB housekeeping pass — streaming
    sinks and over-parallel writes leave thousands of tiny files whose
    open/footer costs dominate scans). Sizing uses the directory's actual
    bytes, so partition count adapts to the data. Optional ``sort_by``
    re-establishes clustering while rewriting (see write_range_sorted).
    Returns the new file count.

    The rewrite goes through a temp dir + two renames, so the window
    where ``path`` is absent is two metadata ops (microseconds), not an
    O(files) ``rmtree`` — and the OLD files survive in a trash dir until
    the swap completes, so a POSIX reader holding open descriptors
    finishes its scan. A reader that re-resolves the PATH inside that
    window can still race; for gapless concurrent reads put the data in
    a :class:`~ncpi_whistler_spark.streaming.cdc.VersionedTable` and use
    :func:`compact_versioned` (pointer swap, no window at all)."""
    import glob
    import os
    import shutil

    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    total_bytes = sum(os.path.getsize(f) for f in files)
    n = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_by:
        df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.coalesce(n) if n < len(files) else df.repartition(n)
    tmp = path.rstrip("/") + "__compact_tmp"
    trash = path.rstrip("/") + "__compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    os.rename(path, trash)
    os.rename(tmp, path)
    shutil.rmtree(trash, ignore_errors=True)
    return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def compact_versioned(
    spark,
    table,
    target_file_mb: int = 256,
    sort_by: list[str] | None = None,
) -> int:
    """Small-file compaction with ZERO reader-visible gap: rewrite the
    current version of a :class:`~ncpi_whistler_spark.streaming.cdc.
    VersionedTable` into right-sized files and publish the result as a
    new directory for the SAME version id (higher publish sequence wins)
    — a compaction changes layout, not logical content. Concurrent
    readers that already resolved the pointer keep scanning the old
    immutable directory (snapshot isolation, bounded by vacuum
    retention); new readers see the compacted one the instant the
    pointer swaps. This is the streaming-sink housekeeping pass: a
    long-lived CDC table accretes one small delta file set per
    micro-batch and periodic compaction restores scan efficiency.

    Bucketed tables keep their bucket layout (one file per bucket — the
    pruning unit); flat tables size by bytes like :func:`compact_parquet`.
    Compaction is a PUBLISH, so it falls under the table's single-writer
    lease: run it from (or between runs of) the table's owning writer —
    a foreign compactor instance would take the lease over and the
    streaming writer's next publish would fail loud (by design).
    Returns the new parquet file count."""
    import glob
    import os

    from pyspark.sql import functions as F

    from ncpi_whistler_spark.streaming.cdc import BUCKET_COL

    if table.current_chain():
        # merge-on-read deltas must fold into the base first — compacting
        # only the base dir would strand (and then orphan) the chain
        table.fold(spark)
    d = table.current_dir()
    version = table.current_version()
    if d is None or version is None:
        raise ValueError(f"VersionedTable at {table.path} has no current version")
    if table.num_buckets is not None:
        df = spark.read.parquet(d)
        if BUCKET_COL in df.columns:
            compacted = df.repartition(
                int(table.num_buckets), F.col(BUCKET_COL)
            ).drop(BUCKET_COL)
        else:
            compacted = df
        # publish() recomputes the bucket column and re-partitions by it;
        # feed="empty" because compaction changes layout, not content —
        # the stored-feed chain stays linked at zero rows
        table.publish(compacted, version, feed="empty")
    else:
        files = glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
        total_bytes = sum(os.path.getsize(f) for f in files)
        n = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
        df = spark.read.parquet(d)
        if sort_by:
            df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(n) if n < len(files) else df.repartition(n)
        table.publish(df, version, feed="empty")
    new_dir = table.current_dir()
    return len(glob.glob(os.path.join(new_dir, "**", "*.parquet"), recursive=True))


def zorder_key(cols, bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column — multi-dimensional clustering where ANY filtered dimension
    gets file-skipping, vs lexicographic sort where only the leading
    column prunes. Callers quantize first (rank/bucketize into
    [0, 2^bits)); the expression is pure codegen bit math, no UDF.
    Pair with repartitionByRange+sortWithinPartitions on the key (see
    write_zordered)."""
    from pyspark.sql import functions as F

    exprs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    key = F.lit(0).cast("long")
    ndim = len(exprs)
    for b in range(bits):
        for i, c in enumerate(exprs):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * ndim + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    partitions: int | None = None,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: every file covers a compact hyper-cube
    of the key space, so parquet min/max stats prune files for filters on
    ANY of ``cols`` — the multi-dimensional complement of
    write_range_sorted (test-measured: a second-dimension filter skips
    files under Z-order and none under linear sort)."""
    n = partitions
    if n is None:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    key = zorder_key(cols, bits).alias("__z")
    (
        df.withColumn("__z", key)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def scratch_materialize(df: DataFrame, scratch_dir: str, name: str) -> DataFrame:
    """Write ``df`` to ``scratch_dir/name`` ONCE and return a fresh scan
    of the written parquet — the disk-backed alternative to ``persist()``
    for multi-consumer intermediate frames that are CORPUS-proportional.

    ``persist(MEMORY_AND_DISK)`` degrades gracefully but still competes
    for executor storage memory and evicts under pressure (re-running the
    upstream plan per consumer); an explicit parquet round-trip pays one
    columnar write and gives every consumer an independent, pruned,
    spill-free scan — the right trade once the frame is a meaningful
    fraction of executor memory (the q104 (doc_id, w, c) frame at 100 TB).
    The caller owns ``scratch_dir`` cleanup (tests pass tmp dirs; cluster
    jobs point at job-scoped scratch storage).
    """
    import os

    path = os.path.join(scratch_dir, name)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
