"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``ncpi_whistler_spark`` package; the query
registry (ncpi_whistler_spark/queries.py) carries each query's oracle SQL
next to its DataFrame builder.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ncpi_whistler_spark.queries import DRIVER_REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the pricing-summary
    aggregation (scan pushdown + partial agg + decimal-exact sums)."""
    fn, _ = DRIVER_REGISTRY["q01_pricing_summary"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly one flagship query per unique operator capability from
    SURVEY.md §2 (50 entries, natural qNN order) — the FULL driver
    surface, so every declared query gets an independent CORRECTNESS
    row. Redundant relational analogs live in queries.REGISTRY and are
    verified by bench.py + tools/parity.py + tests/test_parity.py."""
    return {name: fn for name, (fn, _) in DRIVER_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return {
        name: sql for name, (_, sql) in DRIVER_REGISTRY.items() if sql is not None
    }
