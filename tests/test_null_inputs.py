"""NULL-row robustness: corrupt rows degrade to absence, not crashes.

A 100 TB ingest always carries rows whose text or embedding is NULL
(failed extraction, unembedded shard, schema drift). Policy, pinned
here: a NULL embedding has no geometry — it joins no index and scores
no pair (the rows the SQL oracle's ``list_dot_product(NULL, v) >= t``
comparison would drop); per-row-contract outputs (semantic_dedup) keep
the row with ``cid=null, kept=true``. NULL text was already total
(tokenizers/regexes propagate null → no token rows).

Round-8 sweep findings fixed by similarity._vecs: ivf_train iterated a
None vector, the blocked all-pairs numpy paths choked on None entries,
and the dim probes dereferenced ``first()[0]``.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from ncpi_whistler_spark.queries import REGISTRY
from tests.conftest import SF_DIR

#: every registry query reading documents or embeddings
DOC_EMB_QUERIES = [
    "q20_doc_stats", "q21_lang_guess", "q22_quality_buckets",
    "q23_exact_dedup", "q24_ngram_jaccard", "q25_embedding_topk",
    "q26_embedding_neardup", "q27_minhash_lsh", "q28_simhash_neardup",
    "q29_lsh_topk", "q39_fuzzy_dedup_pipeline",
    "q40_embedding_neardup_bucketed", "q45_bpe_token_counts",
    "q46_bigram_frequencies", "q57_lateral_tokens", "q58_ivf_topk",
    "q63_deterministic_splits", "q65_token_chunks",
    "q68_repetition_filter", "q69_stratified_sample",
    "q79_dedup_components", "q80_fuzzy_dedup_transitive",
    "q81_decontamination", "q82_pii_audit", "q83_curation_funnel",
    "q86_line_dedup", "q87_paragraph_dedup", "q89_semantic_dedup",
    "q90_sequence_packing", "q91_exact_substring_dedup",
    "q92_gopher_rules", "q93_ingest_dedup", "q94_gopher_repetition",
    "q95_lm_perplexity", "q96_dsir_weights", "q97_bm25_topk",
    "q100_bpe_subword_vocab", "q101_corpus_mix", "q102_token_entropy",
    "q104_bpe_apply",
]


@pytest.fixture(scope="session")
def null_sf_dir(tmp_path_factory) -> str:
    """sf0.001 twin with every 7th text, every 11th lang, and every 9th
    embedding nulled out."""
    out = tmp_path_factory.mktemp("sfnull")
    for fname in sorted(os.listdir(SF_DIR)):
        path = os.path.join(SF_DIR, fname)
        if not fname.endswith(".parquet") or os.path.isdir(path):
            continue
        t = pq.read_table(path)
        n = t.num_rows
        if fname == "documents.parquet":
            for col, step in (("text", 7), ("lang", 11)):
                mask = pa.array([i % step == 0 for i in range(n)])
                nulled = pc.if_else(mask, pa.nulls(n, t[col].type), t[col])
                t = t.set_column(t.schema.get_field_index(col), col, nulled)
        elif fname == "embeddings.parquet":
            vcol = next(c for c in t.column_names if c != "vec_id")
            mask = pa.array([i % 9 == 0 for i in range(n)])
            nulled = pc.if_else(mask, pa.nulls(n, t[vcol].type), t[vcol])
            t = t.set_column(t.schema.get_field_index(vcol), vcol, nulled)
        pq.write_table(t, str(out / fname))
    return str(out)


def test_doc_embedding_queries_total_on_null_rows(spark, null_sf_dir):
    failures = []
    for name in DOC_EMB_QUERIES:
        try:
            assert REGISTRY[name][0](spark, null_sf_dir).count() >= 0
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {str(e).splitlines()[0][:120]}")
        spark.catalog.clearCache()
    assert not failures, "\n".join(failures)


def test_semantic_dedup_null_vectors_kept_unclustered(spark, null_sf_dir):
    """One row per input vector survives; null-vector rows come back
    with no cluster and kept=true (absence from every candidate pair)."""
    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, null_sf_dir, "embeddings")
    out = semantic_dedup(emb, threshold=0.4, nlist=4, iters=1, nprobe=1)
    assert out.count() == emb.count()
    nulls = out.join(
        emb.where(F.col("embedding").isNull()).select("vec_id"), on="vec_id"
    )
    got = nulls.select("cid", "kept").distinct().collect()
    assert [(r["cid"], r["kept"]) for r in got] == [(None, True)]


def test_null_vectors_excluded_from_pairs_and_topk(spark, null_sf_dir):
    """Null-vector ids appear in NO pair output and NO neighbor list —
    and dropping them matches running on the pre-filtered corpus."""
    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.operators.dedup import embedding_dup_pairs
    from ncpi_whistler_spark.operators.similarity import cosine_topk

    emb = load_table(spark, null_sf_dir, "embeddings")
    clean = emb.where(F.col("embedding").isNotNull())
    null_ids = {
        r["vec_id"]
        for r in emb.where(F.col("embedding").isNull()).select("vec_id").collect()
    }

    pairs = embedding_dup_pairs(emb, threshold=0.4).collect()
    assert not any(r["id_a"] in null_ids or r["id_b"] in null_ids for r in pairs)
    want = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_dup_pairs(clean, threshold=0.4).collect()
    }
    assert {(r["id_a"], r["id_b"], r["cos_sim"]) for r in pairs} == want

    topk = cosine_topk(emb.limit(30), emb, k=3).collect()
    assert not any(
        r["query_id"] in null_ids or r["neighbor_id"] in null_ids for r in topk
    )


def test_nan_vectors_never_pair_or_rank(spark):
    """Spark compares NaN ABOVE every double, so an unguarded
    ``sim >= t`` marks one corrupt vector a duplicate of its whole
    bucket, and an unguarded desc sort ranks it everyone's top
    neighbor — while the numpy twin drops it by IEEE semantics. Pin the
    guarded behavior: NaN-poisoned rows pair with nothing, rank
    nowhere, and the expression path equals the blocked-numpy path."""
    import math

    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.operators.dedup import embedding_dup_pairs
    from ncpi_whistler_spark.operators.similarity import (
        cosine_topk,
        embedding_pairs_blocked,
        ivf_train,
    )

    emb = load_table(spark, SF_DIR, "embeddings").limit(60)
    one_nan = F.concat(
        F.array(F.lit(float("nan"))), F.slice("embedding", 2, 10_000)
    )
    poisoned = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 17 == 3, one_nan).otherwise(
            F.col("embedding")
        ),
    )
    bad = {
        r["vec_id"]
        for r in poisoned.where(F.col("vec_id") % 17 == 3)
        .select("vec_id")
        .collect()
    }

    fold = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_dup_pairs(poisoned, threshold=0.2).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in embedding_pairs_blocked(poisoned, threshold=0.2).collect()
    }
    assert fold == blocked  # the two exact paths agree under corruption
    assert not any(a in bad or b in bad for a, b, _ in fold)

    topk = cosine_topk(poisoned.limit(20), poisoned, k=3).collect()
    assert not any(r["neighbor_id"] in bad for r in topk)
    assert not any(math.isnan(r["cos_sim"]) for r in topk)

    cents = ivf_train(poisoned, nlist=4, iters=2)
    assert all(math.isfinite(x) for c in cents for x in c)


def test_zero_norm_vectors_total_and_absent(spark):
    """An all-zeros embedding (failed embed) has norm 0 — under ANSI
    mode (Spark 4's default) the cosine division raises DIVIDE_BY_ZERO
    unless the row is excluded up front (_geometry). Pin: no crash, no
    pair, no neighbor rank, and semantic_dedup keeps the row
    (cid=null, kept=true)."""
    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.operators.dedup import embedding_dup_pairs
    from ncpi_whistler_spark.operators.similarity import (
        cosine_topk,
        semantic_dedup,
    )

    emb = load_table(spark, SF_DIR, "embeddings").limit(40)
    zero_vec = F.transform(F.col("embedding"), lambda x: F.lit(0.0))
    poisoned = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 13 == 2, zero_vec).otherwise(
            F.col("embedding")
        ),
    )
    bad = {
        r["vec_id"]
        for r in poisoned.where(F.col("vec_id") % 13 == 2)
        .select("vec_id")
        .collect()
    }
    pairs = embedding_dup_pairs(poisoned, threshold=0.2).collect()
    assert not any(r["id_a"] in bad or r["id_b"] in bad for r in pairs)
    topk = cosine_topk(poisoned.limit(15), poisoned, k=3).collect()
    assert not any(r["neighbor_id"] in bad for r in topk)
    sem = semantic_dedup(poisoned, threshold=0.4, nlist=4, iters=1, nprobe=1)
    assert sem.count() == poisoned.count()
    got = {
        (r["cid"], r["kept"])
        for r in sem.join(
            poisoned.where(F.col("vec_id") % 13 == 2).select("vec_id"),
            on="vec_id",
        ).collect()
    }
    assert got == {(None, True)}


def test_stateful_stream_total_on_null_events(spark, duck, tmp_path):
    """NULL user_id / NULL value events through the stateful per-user
    accumulator: one null-value event used to kill the query (Decimal
    cents can't convert the NaN pandas hands it). Pin SQL twin
    semantics: COUNT(*) counts the row, SUM ignores the NULL, and the
    NULL user_id rows form their own group — exactly the batch oracle
    on the same poisoned frame."""
    import shutil

    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.queries import REGISTRY

    ev = load_table(spark, SF_DIR, "events")
    poisoned = ev.withColumn(
        "user_id",
        F.when(F.col("user_id") % 13 == 0, F.lit(None)).otherwise(
            F.col("user_id")
        ),
    ).withColumn(
        "value",
        F.when(
            F.col("user_id").isNull() | (F.col("user_id") % 7 == 0),
            F.lit(None),
        ).otherwise(F.col("value")),
    )
    d = str(tmp_path / "sfpois")
    os.makedirs(d, exist_ok=True)
    poisoned.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(os.path.join(SF_DIR, f"{t}.parquet"),
                    os.path.join(d, f"{t}.parquet"))

    out = REGISTRY["q88_user_totals_stateful"][0](spark, d)
    got = {
        (
            r["user_id"],
            r["n_events"],
            float(r["total_value"]) if r["total_value"] is not None else None,
        )
        for r in out.collect()
    }
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW pois_events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    # the REGISTRY oracle's shape, no COALESCE: an all-NULL group SUMs
    # to NULL and the stream must emit NULL for it too
    want = {
        (r[0], r[1], float(r[2]) if r[2] is not None else None)
        for r in con.execute(
            "SELECT user_id, COUNT(*), "
            "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) "
            "FROM pois_events GROUP BY user_id"
        ).fetchall()
    }
    con.close()
    assert any(t is None for (_, _, t) in want), "fixture must exercise an all-NULL group"
    assert got == want


def test_semantic_dedup_contract_on_fully_untrainable_corpus(spark):
    """A corpus of ONLY geometry-less vectors (NULL / NaN / zero) still
    returns one row per input — output cardinality must not depend
    discontinuously on whether a single trainable vector exists."""
    from ncpi_whistler_spark.operators.similarity import semantic_dedup

    nan = float("nan")
    df = spark.createDataFrame(
        [(1, [nan, 1.0]), (2, [nan, 2.0]), (3, None), (4, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, threshold=0.4, nlist=2, iters=1, nprobe=1)
    rows = {(r["vec_id"], r["cid"], r["kept"]) for r in out.collect()}
    assert rows == {(1, None, True), (2, None, True), (3, None, True), (4, None, True)}


def test_semantic_dedup_null_element_vector_keeps_row(spark):
    """A vector with a NULL ELEMENT folds to a NULL norm, so the
    geometry predicate is SQL NULL — three-valued logic would drop the
    row from BOTH legs (where(geom) and where(~geom) are each false).
    The coalesce fix routes it to the no-geometry leg: one row per
    input vector, always."""
    from ncpi_whistler_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.5]), (2, [1.0, None]), (3, [0.9, 0.4])],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, threshold=0.1, nlist=2, iters=1, nprobe=1)
    rows = {r["vec_id"]: (r["cid"], r["kept"]) for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2] == (None, True)
