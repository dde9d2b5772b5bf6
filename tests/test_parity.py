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
    assert len(q) == len(REGISTRY)
