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


def test_priority_window_integrity():
    """The first 50 registry entries (the driver-verified window) are
    exactly the declared priority list — 50 unique, all present, every
    one oracle-checked."""
    from ncpi_whistler_spark.queries import _PRIORITY_WINDOW, REGISTRY

    assert len(_PRIORITY_WINDOW) == 50
    assert len(set(_PRIORITY_WINDOW)) == 50
    missing = [n for n in _PRIORITY_WINDOW if n not in REGISTRY]
    assert missing == [], f"stale window names: {missing}"
    first50 = list(REGISTRY)[:50]
    assert first50 == _PRIORITY_WINDOW
    no_oracle = [n for n in first50 if REGISTRY[n][1] is None]
    assert no_oracle == [], f"rows-only queries in the window: {no_oracle}"
