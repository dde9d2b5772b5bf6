"""Driver-mirror correctness gate: every registered query must match its
DuckDB oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from ncpi_whistler_spark.queries import REGISTRY
from tests.conftest import SF_DIR
from tools.parity import compare


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    fn, oracle = REGISTRY[name]
    sdf = fn(spark, SF_DIR)
    if oracle is None:
        assert sdf.count() >= 0  # rows-only smoke (non-SQL-expressible op)
        return
    cur = duck.execute(oracle)
    orows = cur.fetchall()
    ocols = [d[0] for d in cur.description]
    problems = compare(name, sdf, orows, ocols)
    assert not problems, problems


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    from ncpi_whistler_spark.queries import DRIVER_REGISTRY

    assert list(q) == list(DRIVER_REGISTRY)
    assert len(q) <= 50


def test_driver_registry_integrity():
    """The driver surface is exactly 50 unique, registered, oracle-checked
    queries in natural qNN order — 100% of what __spark_entry__ declares
    gets an independent driver CORRECTNESS row."""
    from ncpi_whistler_spark.queries import DRIVER_QUERIES, DRIVER_REGISTRY, REGISTRY

    assert len(DRIVER_QUERIES) == 50
    assert len(set(DRIVER_QUERIES)) == 50
    assert all(n in REGISTRY for n in DRIVER_QUERIES)
    nums = [int(n[1:].split("_", 1)[0]) for n in DRIVER_QUERIES]
    assert nums == sorted(nums), "driver surface must be natural qNN order"
    no_oracle = [n for n in DRIVER_QUERIES if REGISTRY[n][1] is None]
    assert no_oracle == [], f"rows-only queries in driver surface: {no_oracle}"
    assert list(DRIVER_REGISTRY) == DRIVER_QUERIES
