"""Concurrent queries on one shared session — the multi-tenant pattern.

On a real cluster one SparkSession routinely serves many threads (a
query service, a notebook scheduler, Spark's own FAIR scheduler docs
assume it). The engine's only process-global state is the catalog's
table memo and the operators' bounded plan caches; these tests pin that
N threads driving diverse registry queries through one session get
bit-identical results to a serial run — no temp-view clobbering, no
cache races, no "dictionary changed size" from the catalog memo's
eviction sweep (which is why load_table takes a lock).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from ncpi_whistler_spark.queries import REGISTRY
from tests.conftest import SF_DIR

#: A cross-section of the engine: relational agg, window top-k, nested
#: restructure, harmonize broadcast join, MinHash/SimHash dedup, CMS
#: heavy hitters (bounded sketch cache), histogram brackets, BM25,
#: splits, HLL, gopher flags. Streaming shapes are excluded: two copies
#: of one stateful query sharing a checkpoint is user error, not a
#: concurrency property worth pinning.
CONCURRENT_SET = [
    "q01_pricing_summary",
    "q02_group_nested_orders",
    "q05_harmonize_returnflag",
    "q06_topk_orders_per_customer",
    "q27_minhash_lsh",
    "q28_simhash_neardup",
    "q63_deterministic_splits",
    "q84_hll_explicit",
    "q92_gopher_rules",
    "q97_bm25_topk",
    "q98_cms_heavy_hitters",
    "q103_histogram_quantiles",
]


def _canon(df) -> list[str]:
    return sorted(repr(tuple(r)) for r in df.collect())


@pytest.fixture(autouse=True)
def _fresh_catalog(spark):
    # Start from a cold table memo so the concurrent run exercises the
    # first-load insert path (the one that raced with eviction).
    from ncpi_whistler_spark import catalog

    with catalog._TABLE_CACHE_LOCK:
        catalog._TABLE_CACHE.clear()
    spark.catalog.clearCache()
    yield
    spark.catalog.clearCache()


def test_concurrent_queries_match_serial(spark):
    serial = {n: _canon(REGISTRY[n][0](spark, SF_DIR)) for n in CONCURRENT_SET}

    from ncpi_whistler_spark import catalog

    with catalog._TABLE_CACHE_LOCK:
        catalog._TABLE_CACHE.clear()
    spark.catalog.clearCache()

    def run(name: str) -> tuple[str, list[str]]:
        return name, _canon(REGISTRY[name][0](spark, SF_DIR))

    with ThreadPoolExecutor(max_workers=8) as pool:
        concurrent = dict(pool.map(run, CONCURRENT_SET))

    for name in CONCURRENT_SET:
        assert concurrent[name] == serial[name], name


def test_same_query_concurrent_instances(spark):
    """Eight instances of the one query with a bounded operator cache
    (cms_estimate persists its sketch) racing on one session."""
    name = "q98_cms_heavy_hitters"
    want = _canon(REGISTRY[name][0](spark, SF_DIR))
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(
            pool.map(lambda _: _canon(REGISTRY[name][0](spark, SF_DIR)), range(8))
        )
    assert all(r == want for r in results)
