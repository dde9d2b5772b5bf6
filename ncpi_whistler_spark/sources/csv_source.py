"""Normalized CSV table scan (SURVEY.md §2.1 S1/S2/U1).

Reference behavior (wstlr/extractor.py:130-194,334-351): DictReader over one
or more comma-listed CSV files (utf-8-sig, quotechar '"', configurable
delimiter), every header passed through fix_fieldname, all cells kept as
strings. Multi-file lists are a union.

Spark-first: one ``spark.read.csv`` with a path list — multi-path IS the
union, executed as parallel partitioned file scans, and Catalyst pushes
projections/filters into the scan. Values stay strings
(``inferSchema=False``) for reference parity; typed reads are opt-in via a
data dictionary (sources/dd.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ncpi_whistler_spark.functions.core import fix_fieldname


def scan_csv(
    spark: SparkSession,
    paths: str | list[str],
    delimiter: str = ",",
    row_id: str | None = None,
) -> DataFrame:
    """Scan CSV file(s) into a string-typed DataFrame with normalized
    headers.

    ``paths`` accepts a comma-separated string (the reference's config
    spelling, wstlr/extractor.py:334-351) or a list; multiple files union
    by position like the reference's sequential DictReader append.

    ``row_id`` optionally adds a monotonically-increasing id column at scan
    time. The reference preserves CSV row order implicitly (single-threaded
    read); Spark is unordered, so order-observable operators (group-content
    ordering, first-per-group) sort on this id instead — see SURVEY.md §7
    risk 1.
    """
    if isinstance(paths, str):
        paths = [p.strip() for p in paths.split(",") if p.strip()]
    df = (
        spark.read.option("header", True)
        .option("sep", delimiter)
        .option("quote", '"')
        .option("encoding", "UTF-8")
        .option("mode", "PERMISSIVE")
        # all-string schema: reference parity (csv.DictReader yields str)
        .option("inferSchema", False)
        .option("emptyValue", "")
        .csv(paths)
    )
    # empty cells are empty STRINGS, not NULLs (csv.DictReader semantics —
    # the missing-value vocabulary includes "" by design; Spark's parser
    # yields null for unquoted empties regardless of nullValue)
    df = df.na.fill("")
    df = df.toDF(*[fix_fieldname(c) for c in df.columns])
    if row_id:
        from pyspark.sql import functions as F

        df = df.withColumn(row_id, F.monotonically_increasing_id())
    return df
