"""Plan-shape regression guards: the scale claims in SCALING.md are
assertions about shuffle structure — lock the key ones in so a refactor
that quietly adds an Exchange fails here, not at 100 TB."""

from __future__ import annotations

import re

import pytest

from ncpi_whistler_spark.queries import REGISTRY
from tests.conftest import SF_DIR


@pytest.fixture(autouse=True)
def _clean_cache(spark):
    """Plan-shape assertions must see BUILD plans: operators with
    by-design bounded caches (cms_estimate's sketch, q104's tokc,
    histogram brackets' cum) leave persisted frames behind, and the
    CacheManager substitutes them into any later canonically-equal plan
    — hiding the exchanges these tests count, order-dependently."""
    spark.catalog.clearCache()
    yield


def _shuffles(df) -> int:
    """Count shuffle exchanges (excludes BroadcastExchange)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"(?<!Broadcast)Exchange (?:hashpartitioning|SinglePartition|rangepartitioning)", plan))


def test_q69_sampling_is_map_side(spark):
    """Selection is a rowwise predicate; the only shuffle is the
    |sources|-group audit rollup."""
    df = REGISTRY["q69_stratified_sample"][0](spark, SF_DIR)
    assert _shuffles(df) == 1


def test_q68_per_doc_stage_single_shuffle(spark):
    """N-gram window and per-doc totals/distinct agg share the doc-id
    partitioning: one token-row shuffle + the final source rollup."""
    df = REGISTRY["q68_repetition_filter"][0](spark, SF_DIR)
    assert _shuffles(df) == 2


def test_q01_partial_agg_single_shuffle(spark):
    """Pricing summary: partial agg map-side, one exchange on the group
    keys."""
    df = REGISTRY["q01_pricing_summary"][0](spark, SF_DIR)
    assert _shuffles(df) == 1


def test_q41_dims_broadcast(spark):
    """TPC-H Q7 shape: every dimension broadcasts; the only shuffles are
    the lineitem⋈orders join and the final rollup."""
    df = REGISTRY["q41_nation_trade_pairs"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_q71_predicates_push_to_scan(spark):
    """Every q71 predicate reaches the parquet scan and the read schema
    is pruned to the four referenced columns."""
    import contextlib
    import io

    df = REGISTRY["q71_forecast_revenue"][0](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")  # AQE hides scan details in executedPlan's toString
    plan = buf.getvalue()
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan
    assert "LessThan(l_quantity,24.0)" in plan, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q26_no_driver_collect_at_plan_build(spark):
    """Round-2 scale fix: building the q26 plan must not run ANY Spark
    job (the old path collected the whole embedding corpus to the driver
    at plan-build). Guarded by asserting zero jobs are triggered while
    the DataFrame is constructed."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = REGISTRY["q26_embedding_neardup"][0](spark, SF_DIR)
    after = tracker.getJobIdsForGroup(None)
    # spark.read.parquet runs one footer/schema job per table; a corpus
    # collect would add (at least) one more on top of it
    assert len(after) - len(before) <= 1, "q26 plan-build collected data"
    # and the plan itself carries no broadcast of a collected corpus
    assert df.columns == ["id_a", "id_b", "cos_sim"]


def test_q52_fully_lazy(spark):
    """The scalar-average subquery stays in-plan (broadcast cross join),
    so plan construction runs zero jobs."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    REGISTRY["q52_idle_rich_customers"][0](spark, SF_DIR)
    after = tracker.getJobIdsForGroup(None)
    # two table loads -> at most two footer/schema jobs; the old eager
    # scalar-average collect added a full aggregation job on top
    assert len(after) - len(before) <= 2, "q52 plan-build collected data"


def test_trailing_range_agg_equals_window_form(spark):
    """The overlap-padded time-bucketing rewrite of the trailing-hour
    RANGE frame returns exactly the window function's rows (q55 shape),
    while shuffling on (event_type, hour-bucket) instead of event_type
    alone — the 100 TB form."""
    from pyspark.sql import functions as F

    from ncpi_whistler_spark.operators.relational import trailing_range_agg
    from ncpi_whistler_spark.queries import REGISTRY, load_table

    ev = load_table(spark, SF_DIR, "events")
    rewritten = trailing_range_agg(
        ev,
        id_cols=["event_id"],
        partition_cols=["event_type"],
        ts_micros=F.unix_micros(F.col("ts").cast("timestamp")),
        window_micros=3_600_000_000,
        value_cols=["value"],
        aggs={
            "n_trailing": F.count(F.lit(1)),
            "sum_trailing": F.sum(F.col("w_value").cast("decimal(18,2)")).cast(
                "double"
            ),
        },
    )
    window_form = REGISTRY["q55_trailing_hour_window"][0](spark, SF_DIR)
    cols = ["event_id", "event_type", "n_trailing", "sum_trailing"]
    a = sorted(map(tuple, rewritten.select(*cols).collect()))
    b = sorted(map(tuple, window_form.select(*cols).collect()))
    assert a == b
    # and the rewrite's shuffle key includes the time bucket
    plan = rewritten._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" in plan


def test_bucketed_sessionize_equals_window_form(spark):
    """q19's skew-safe (user, day-bucket) rewrite returns exactly the
    lag/cumsum window form's rows on the real events fixture, and its
    event-level shuffle key includes the time bucket (the hot-user
    bound)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ncpi_whistler_spark.operators.relational import bucketed_session_counts
    from ncpi_whistler_spark.queries import load_table

    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    legacy = marked.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )
    rewritten = bucketed_session_counts(
        ev, "user_id", "ts", order_cols=["event_id"], gap_secs=1800
    )
    a = sorted(map(tuple, legacy.collect()))
    b = sorted(map(tuple, rewritten.collect()))
    assert a == b
    plan = rewritten._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" in plan


def test_bucketed_sessionize_boundary_cases(spark):
    """Hand-built sessions that straddle bucket edges: a gap of exactly
    gap_secs does NOT split (strict >), one second more does, sessions
    spanning 3 buckets count once, and empty buckets between events
    don't phantom-split."""
    from ncpi_whistler_spark.operators.relational import bucketed_session_counts

    B = 3600  # 1h buckets for the test
    rows = [
        # u1: events at 0s, 1800s (gap == 1800 -> same session),
        # 3601s (gap 1801 -> new session), then 3 bucket-straddling
        # events 100s apart crossing the 7200s bucket edge (gap from
        # 3601 -> their own session), then a multi-bucket silent
        # stretch and one more event (new session).
        ("u1", 0),
        ("u1", 1800),
        ("u1", 3601),
        ("u1", 7150),
        ("u1", 7250),
        ("u1", 7350),
        ("u1", 21000),
        # u2: single event
        ("u2", 5),
    ]
    df = spark.createDataFrame(
        [(u, s) for u, s in rows], "user_id string, secs long"
    ).selectExpr("user_id", "timestamp_seconds(secs) AS ts", "secs AS event_id")
    out = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in bucketed_session_counts(
            df, "user_id", "ts", order_cols=["event_id"], bucket_secs=B
        ).collect()
    }
    assert out == {"u1": (4, 7), "u2": (1, 1)}


def test_q24_hot_shingle_guard_is_broadcast_anti(spark):
    """The max_df skew guard joins hot shingles as a broadcast anti join
    — the index side must NOT shuffle for the guard."""
    df = REGISTRY["q24_ngram_jaccard"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan), plan


def test_q90_prefix_sum_plan_shape(spark):
    """The bucketed prefix sum's SCALING claim, locked in: the full-data
    path sees exactly ONE shuffle (hash on the bucket key) and a
    bucket-partitioned window — never a global single-partition sort of
    the corpus; the only SinglePartition exchange feeds the |buckets|-row
    offset cumsum, and offsets come back via broadcast join."""
    df = REGISTRY["q90_sequence_packing"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # offsets join, fact side unshuffled
    # one SinglePartition exchange total — and it sits AFTER the
    # per-bucket aggregate (input = __bkt + partial sum, not raw rows)
    singles = re.findall(r"Exchange SinglePartition", plan)
    assert len(singles) == 1, plan
    # the big window is partitioned by the bucket key
    assert re.search(r"windowspecdefinition\(__bkt#\d+L, doc_id#\d+L ASC", plan), plan
    # data-path shuffles: one hash on __bkt for the per-doc window + the
    # two tiny aggregate exchanges (partial/final + SinglePartition)
    assert _shuffles(df) == 3, plan


def test_selection_ops_have_no_window_operator(spark):
    """q91/q95/q96/q97 build n-gram/window features map-side from the
    token array (slice+zip_with/transform) — the lead()-window stitch
    would put a Window (partitionBy doc, sort by pos) over the whole
    token stream. Lock the map-side shape in: no Window node anywhere."""
    for name in (
        "q91_exact_substring_dedup",
        "q95_lm_perplexity",
        "q96_dsir_weights",
        "q97_bm25_topk",
    ):
        df = REGISTRY[name][0](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, f"{name} regressed to a window stitch"


def test_bm25_doc_length_is_map_side(spark):
    """BM25's per-doc length comes from size(tokens) on the source row,
    not a groupBy over the exploded token stream: the hit-list shuffle
    is term-selectivity-sized, and dl adds no token-stream shuffle."""
    df = REGISTRY["q97_bm25_topk"][0](spark, SF_DIR)
    # total shuffles: tf agg, dfreq agg, (N,S) reduce, dl join, final
    # score agg + TakeOrdered — all over hit/doc-scale streams; the
    # full token stream is never shuffled (would add explode-sized
    # exchanges well beyond this bound).
    assert _shuffles(df) <= 7


def test_q104_subword_map_joins_broadcast_at_word_grain(spark):
    """BPE application must carry the (word -> subwords) map back to the
    corpus via a BROADCAST join at (doc, word)-count grain: the raw
    token stream is never the probe side of a shuffle join (a
    SortMergeJoin here would shuffle the whole corpus token stream on
    the word key at 100 TB)."""
    df = REGISTRY["q104_bpe_apply"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the word-key join must be broadcast…
    assert re.search(r"BroadcastHashJoin \[w#\d+\], \[w#\d+\]", plan), plan
    # …and must never appear as a shuffle join (the doc_id-grain outer
    # rollup joins may legitimately sort-merge; the word key must not)
    assert not re.search(r"SortMergeJoin \[w#\d+\]", plan), (
        "subword map regressed to a shuffle join on the word key"
    )


def test_q104_scratch_dir_equals_persist_and_reads_corpus_once(spark, tmp_path):
    """The 100 TB tier promised by q104's docstring, as code: with
    scratch_dir= the (doc_id, w, c) frame is written to parquet ONCE and
    every consumer scans the written file — results identical to the
    persist tier, and the plan proves the corpus is never re-read (no
    FileScan in the final plan touches the documents text column; the
    only documents scan is the doc_id outer-join spine)."""
    from ncpi_whistler_spark.queries import q104_bpe_apply

    key = lambda r: r["doc_id"]  # noqa: E731
    want = sorted(REGISTRY["q104_bpe_apply"][0](spark, SF_DIR).collect(), key=key)
    got_df = q104_bpe_apply(spark, SF_DIR, scratch_dir=str(tmp_path))
    got = sorted(got_df.collect(), key=key)
    assert got == want

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    # every tokc consumer scans the written scratch parquet (matched by
    # its (doc_id, w[, c]) read schema — file paths elide in plan text) …
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    tokc_scans = [s for s in schemas if s.startswith("doc_id:bigint,w:string")]
    assert len(tokc_scans) >= 2, schemas
    # … and no scan in the plan reads the corpus text column (the
    # explode would be the corpus re-read)
    assert schemas and not any("text:" in s for s in schemas), schemas


def test_bpe_fit_scratch_dir_equals_checkpoint(spark, tmp_path):
    """bpe_fit's scratch tier (word table materialized to parquet instead
    of executor block storage) learns the identical merge list."""
    from ncpi_whistler_spark.operators.text import bpe_fit
    from ncpi_whistler_spark.queries import load_table

    docs = load_table(spark, SF_DIR, "documents")
    want, _ = bpe_fit(docs, num_merges=4)
    got, words = bpe_fit(docs, num_merges=4, scratch_dir=str(tmp_path))
    assert got == want
    assert words.count() > 0


def test_cms_sketch_single_shuffle(spark):
    """The CM sketch build is ONE partial-aggregated shuffle on the
    (row, col) cells — the mergeable-sketch scale claim in SCALING.md."""
    from ncpi_whistler_spark.operators.profiling import cms_sketch
    from ncpi_whistler_spark.queries import load_table

    docs = load_table(spark, SF_DIR, "documents")
    tok = docs.selectExpr("explode(split(lower(text), '\\\\s+')) AS tok").where(
        "tok != ''"
    )
    assert _shuffles(cms_sketch(tok, "tok")) == 1


def test_cms_estimate_lazy_sketch_sliced_from_cache(spark):
    """A LAZY sketch handed straight to cms_estimate (the q98 registry
    shape) must be persisted inside the estimator before the per-row
    slicing: the depth row-filtered BroadcastExchanges are distinct
    sub-plans Spark cannot reuse, so without the internal persist the
    corpus-scale sketch aggregation would re-run once per hash row.
    Pinned by the executed plan reading every slice from
    InMemoryTableScan with zero corpus re-aggregations behind them."""
    from ncpi_whistler_spark.operators.profiling import cms_estimate, cms_sketch
    from ncpi_whistler_spark.queries import load_table

    docs = load_table(spark, SF_DIR, "documents")
    tok = docs.selectExpr("explode(split(lower(text), '\\\\s+')) AS tok").where(
        "tok != ''"
    )
    queries = tok.limit(5)
    est = cms_estimate(cms_sketch(tok, "tok", depth=4), queries, "tok", depth=4)
    est.collect()  # materializes the internal cache
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 4, plan
    # every slice's broadcast side scans the SAME cached build: the
    # printed cached plan repeats under each InMemoryTableScan (with
    # re-aliased attribute ids, the self-join dedup), but its build
    # Exchange carries at most TWO distinct plan_ids — the one cached
    # AQE plan's final + initial text. Four independent re-aggregations
    # would print four distinct build exchanges. (An unpersisted sketch
    # shows zero InMemoryTableScans and fails the assert above.)
    build_ids = set(
        re.findall(r"Exchange hashpartitioning\(row#.*?plan_id=(\d+)", plan)
    )
    assert len(build_ids) <= 2, (
        f"sketch aggregation appears as {len(build_ids)} distinct "
        f"exchanges — re-run per hash row"
    )


def test_exact_substring_paired_keys_add_no_shuffle(spark):
    """Round-6 key widening must be free in plan shape: the paired
    (wh1, wh2) struct keys of the xxhash64 production mode use exactly
    the same number of exchanges as the md5 single-chain oracle mode —
    the second chain is map-side arithmetic, never a new shuffle."""
    from ncpi_whistler_spark.operators.dedup import exact_substring_coverage
    from ncpi_whistler_spark.queries import load_table

    docs = load_table(spark, SF_DIR, "documents")
    md5_shuffles = _shuffles(exact_substring_coverage(docs, window=10, hash_fn="md5"))
    prod_shuffles = _shuffles(
        exact_substring_coverage(docs, window=10, hash_fn="xxhash64")
    )
    assert prod_shuffles == md5_shuffles


def test_embedding_family_no_hof_element_scans(spark):
    """The no-geometry gates must stay O(1) norm comparisons: an
    exists()/forall() element scan in these hot paths is an interpreted
    HOF per ROW and measurably regressed q40/q25 when it briefly
    shipped in round 8 (bench gate). ivf_train's training-scan fold is
    the one sanctioned exception (iters-bounded) and runs inside the
    driver-side train call, not these query plans' scoring stages."""
    for name in (
        "q25_embedding_topk",
        "q26_embedding_neardup",
        "q29_lsh_topk",
        "q40_embedding_neardup_bucketed",
    ):
        df = REGISTRY[name][0](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "exists(" not in plan and "ArrayExists" not in plan, name
