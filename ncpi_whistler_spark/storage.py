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
