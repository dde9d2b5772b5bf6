"""Profiling / summary operators (A3, A4, E8-style validation checks).

Reference: module×resourceType count summaries (wstlr/module_summary.py:
9-41), per-variable value-count + min/max profiling with a 50-distinct
cutoff (wstlr/dd/dd_from_fhir.py:41-125), duplicate-identifier inspection
(wstlr/inspector.py:27-97).

All pure DataFrame aggregations: partial (map-side) aggregation + one
shuffle per profile; the multi-column profile unions per-column aggs so
each column is scanned/pruned independently by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def count_summary(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """A3: counts per group plus percent-of-total (wstlr/module_summary.py:
    9-41, wstlr/load.py:455-470). Percent via a window over the grouped
    (already tiny) result — no second scan of the input."""
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy()
    return counts.withColumn(
        "pct",
        F.round(F.col("n") * 100.0 / F.sum("n").over(total), 2),
    )


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """A4: per-column profile — row/distinct/null counts and numeric
    min/max under the reference's try-float guard
    (wstlr/dd/dd_from_fhir.py:41-54).

    Output: (variable, n, n_distinct, n_null, min_num, max_num).
    One aggregate pass per column, unioned; each branch prunes to a single
    column so the parquet scan reads only what it profiles.
    """
    columns = columns or df.columns
    parts = []
    for c in columns:
        num = F.col(c).cast("string").try_cast("double")
        parts.append(
            df.select(
                F.lit(c).alias("variable"),
                F.col(c).alias("value"),
                num.alias("num"),
            ).agg(
                F.first("variable").alias("variable"),
                F.count(F.lit(1)).cast("long").alias("n"),
                F.count_distinct("value").cast("long").alias("n_distinct"),
                F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
                F.min("num").cast("double").alias("min_num"),
                F.max("num").cast("double").alias("max_num"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def value_counts(
    df: DataFrame, column: str, max_distinct: int = 50
) -> DataFrame:
    """A4: value histogram with the reference's >50-distinct suppression
    (wstlr/dd/dd_from_fhir.py:75,88): if the column exceeds the cutoff the
    result is empty (the reference drops the histogram, keeping min/max).

    Fully lazy AND distributed: the distinct count is a scalar aggregate
    over the grouped result, broadcast back via cross join — no eager
    collect at plan-build, no single-partition window, and ReuseExchange
    dedups the shared groupBy shuffle (count_distinct(column) ==
    count of non-null groups, so no second scan of ``df``)."""
    counts = df.groupBy(F.col(column).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    nd = counts.agg(F.count("value").alias("__nd"))
    return (
        counts.crossJoin(F.broadcast(nd))
        .where(F.col("__nd") <= max_distinct)
        .drop("__nd")
    )


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """E8: duplicate-identifier check (wstlr/inspector.py:27-63) — keys
    appearing more than once, with their multiplicity."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
