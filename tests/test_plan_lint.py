"""Registry-wide plan lint: machine-checked floor under EVERY query.

test_plan_shapes.py locks exact shuffle counts for the queries whose
plans the scale docs argue about; this file is the coarse complement —
one sweep over all of REGISTRY asserting the two plan shapes that are
NEVER acceptable at 100 TB appear nowhere (or only where a documented
exact tier earns an explicit allowlist entry):

- ``BatchEvalPython``: a row-at-a-time Python UDF. Every Python escape
  hatch in this engine is Arrow-batched (ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas) — a stray F.udf() in a refactor lands here.
- ``CartesianProduct``: an all-pairs join that never finishes at scale.
  Broadcast single-row crossJoins (totals, corpus stats) plan as
  BroadcastNestedLoopJoin with a 1-row build side and are fine; a true
  CartesianProduct means both sides were too big to broadcast — exactly
  the plan that must not survive a refactor.
"""

from __future__ import annotations

import pytest

from ncpi_whistler_spark.queries import REGISTRY
from tests.conftest import SF_DIR

#: Documented exact tiers whose semantics ARE all-pairs (kept as oracle
#: baselines next to their bucketed production twins). Nothing else may
#: plan a CartesianProduct.
CARTESIAN_ALLOWED: set[str] = set()


@pytest.fixture(autouse=True)
def _clean_cache(spark):
    # Bounded operator caches (cms sketch, q104 tokc) would substitute
    # InMemoryRelations into later canonically-equal plans, hiding the
    # nodes this lint greps for.
    spark.catalog.clearCache()
    yield
    spark.catalog.clearCache()


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_registry_plans_clean(spark):
    violations: list[str] = []
    for name, (fn, _oracle) in REGISTRY.items():
        df = fn(spark, SF_DIR)
        plan = _physical(df)
        if "BatchEvalPython" in plan:
            violations.append(f"{name}: row-at-a-time Python UDF (BatchEvalPython)")
        if "CartesianProduct" in plan and name not in CARTESIAN_ALLOWED:
            violations.append(f"{name}: CartesianProduct outside the exact-tier allowlist")
        spark.catalog.clearCache()
    assert not violations, "\n".join(violations)
