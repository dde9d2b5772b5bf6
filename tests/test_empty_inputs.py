"""Empty-input totality: every query degrades to empty, never crashes.

At cluster scale, zero-row inputs are routine — a date-range filter that
matches nothing, a partition with no late events, an ingest batch that
deduped to nothing. An operator that crashes on empty input turns a
quiet day into a paged incident. This sweep runs EVERY registry query
over a zero-row fixture (same schemas as the real one) and asserts each
returns a well-formed result instead of raising.

The embedding family is also pinned directly: k-means training on an
empty corpus (ivf_train → []), IVF search with live queries against an
empty corpus, SemDeDup over nothing, and the blocked all-pairs path's
empty-matrix reshape — each short-circuits to an EMPTY result with the
SAME schema as the populated path (found by this sweep in round 8:
cents[0] / mat.shape[1] / first()[0] all raised on zero rows).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from ncpi_whistler_spark.queries import REGISTRY
from tests.conftest import SF_DIR


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory) -> str:
    """Zero-row twin of the sf0.001 fixture (schema-identical parquet)."""
    out = tmp_path_factory.mktemp("sf0")
    for fname in sorted(os.listdir(SF_DIR)):
        if not fname.endswith(".parquet"):
            continue
        path = os.path.join(SF_DIR, fname)
        if os.path.isdir(path):  # directory-layout table
            part = next(
                os.path.join(path, p)
                for p in os.listdir(path)
                if p.endswith(".parquet")
            )
            schema = pq.read_schema(part)
        else:
            schema = pq.read_schema(path)
        pq.write_table(schema.empty_table(), str(out / fname))
    return str(out)


def test_all_registry_queries_total_on_empty_inputs(spark, empty_sf_dir):
    failures = []
    for name, (fn, _oracle) in REGISTRY.items():
        try:
            n = fn(spark, empty_sf_dir).count()
        except Exception as e:  # noqa: BLE001 — collecting the full list
            failures.append(f"{name}: {type(e).__name__}: {str(e).splitlines()[0][:120]}")
            continue
        assert n >= 0
        spark.catalog.clearCache()
    assert not failures, "\n".join(failures)


def test_ivf_topk_empty_corpus_live_queries(spark, empty_sf_dir):
    """The asymmetric case the registry sweep can't hit (both sides are
    the same table there): real queries, empty corpus."""
    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.operators.similarity import ivf_topk

    queries = load_table(spark, SF_DIR, "embeddings").limit(5)
    corpus = load_table(spark, empty_sf_dir, "embeddings")
    out = ivf_topk(queries, corpus, k=3, nlist=4, nprobe=2, iters=1)
    assert out.count() == 0
    want = ivf_topk(queries, queries, k=3, nlist=2, nprobe=1, iters=1)
    assert out.dtypes == want.dtypes  # schema identical to populated path


def test_semantic_dedup_empty_schema_stable(spark, empty_sf_dir):
    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.operators.similarity import semantic_dedup

    empty = load_table(spark, empty_sf_dir, "embeddings")
    full = load_table(spark, SF_DIR, "embeddings").limit(8)
    e = semantic_dedup(empty, threshold=0.4, nlist=4, iters=1, nprobe=1)
    f = semantic_dedup(full, threshold=0.4, nlist=2, iters=1, nprobe=1)
    assert e.count() == 0
    assert e.dtypes == f.dtypes


def test_ivf_train_empty_returns_no_centroids(spark, empty_sf_dir):
    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.operators.similarity import ivf_train

    assert ivf_train(load_table(spark, empty_sf_dir, "embeddings"), nlist=4) == []
