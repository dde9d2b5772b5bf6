"""Scale-evidence bench for the dedup/ANN query family (VERDICT r2 #1).

Measures how the engine's dedup/similarity operators scale with corpus
size by replicating ``documents``/``embeddings`` k× and running the real
registry queries against the replicated parquet.

Replication is STRUCTURE-PRESERVING, not naive: the round-2 adversarial
probe (NOTES.md) showed that copying the corpus k× verbatim makes every
replica a true near-dup of every other, so the OUTPUT is k²-sized by
construction and the run measures result materialization, not the
engine. Instead each replica r is salted so intra-replica duplicate
structure is identical to the base corpus but replicas share nothing:

- documents: every whitespace token gets a ``~r`` suffix (Jaccard/
  MinHash/SimHash relations within a replica are byte-identical to the
  base corpus; cross-replica shingles can never collide), ids stride by
  r * 10^9.
- embeddings: vectors get a per-replica orthogonal transform (rotate by
  r positions + a deterministic sign-flip pattern; intra-replica cosine
  structure is exactly preserved, cross-replica similarities
  decorrelate — rotation alone leaks correlation on clustered
  embeddings), ids stride by r * 10^9.

True positives therefore scale ~k and the measured time reflects the
candidate-generation machinery (inverted index, banding, bucketing,
k-means) at k× the data — the quantity the 100 TB design arguments are
about. The fitted exponent is the log-log slope of wall time vs k over
the measured k's ≥ warm-up; ~1.0 = linear scaling.

Usage:
  PYTHONPATH=/root/repo python tools/scalebench.py \
      [--ks 1,4,16,64] [--queries q24,q27,...] [--sf-dir /root/testdata/sf0.1] \
      [--workdir /root/repo/.scalebench] [--out SCALEBENCH.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import time

ID_STRIDE = 10**9

#: the dedup/ANN family called out by the round-2 verdict
DEFAULT_QUERIES = [
    "q24_ngram_jaccard",
    "q27_minhash_lsh",
    "q28_simhash_neardup",
    "q39_fuzzy_dedup_pipeline",
    "q40_embedding_neardup_bucketed",
    "q40x_neardup_scaled_bits",
    "q58_ivf_topk",
    "q80_fuzzy_dedup_transitive",
    "q89_semantic_dedup",
    "q89x_semantic_dedup_scaled",
    "q90x_pack_sequences",
    "q94_gopher_repetition",
    "q35_winnowing",
    "q79h_cc_star_hub",
    "q79hm_cc_star_minlabel",
    "q79c_cc_star_chain",
    "q79cm_cc_minlabel_chain",
]


def _q40_scaled_bits(spark, kdir: str, k: int):
    """q40's operator with the scale knob actually turned: bucket_bits
    grows with log2(k) so per-bucket occupancy stays constant as the
    corpus grows. The registry q40 pins bucket_bits=4 for oracle
    determinism, which makes its candidate set n^2/16 — a fan-in CUT,
    not an asymptote; THIS entry is the 100 TB operating mode (hold
    density fixed, candidates ~n), and its measured exponent is the one
    the design argument rests on."""
    from ncpi_whistler_spark.operators.dedup import embedding_dup_pairs

    emb = spark.read.parquet(os.path.join(kdir, "embeddings.parquet"))
    bits = 4 + max(0, round(math.log2(k)))
    # tables=1 pinned: this sweep measures the bits-growth knob alone
    # (comparable with the recorded SCALEBENCH jsons); production
    # default is tables=24
    return embedding_dup_pairs(emb, threshold=0.4, bucket_bits=bits, tables=1)


def _q55_trailing_bucketed(spark, kdir: str, k: int):
    """q55's 100 TB rewrite (overlap-padded time bucketing, shuffle key =
    (event_type, hour-bucket)) on the replicated events — the contrast
    point to the registry q55, whose window form serializes each
    low-cardinality event_type into one executor-sized sort. Row-identical
    to the window form (test_plan_shapes proves it); only the plan shape
    differs."""
    from pyspark.sql import functions as F

    from ncpi_whistler_spark.catalog import event_micros
    from ncpi_whistler_spark.operators.relational import trailing_range_agg

    ev = spark.read.parquet(os.path.join(kdir, "events.parquet"))
    return trailing_range_agg(
        ev,
        id_cols=["event_id"],
        partition_cols=["event_type"],
        ts_micros=event_micros("ts"),
        window_micros=3_600_000_000,
        value_cols=["value"],
        aggs={
            "n_trailing": F.count(F.lit(1)),
            "sum_trailing": F.sum(
                F.col("w_value").cast("decimal(18,2)")
            ).cast("double"),
        },
    )


def _cc_star_edges(spark, kdir: str):
    """Adversarial CC topology from the replicated corpus: ONE hub node
    (-1) participates in 50% of all edges (the zipfian dedup-graph
    shape), pendant chains hang off the other half. Deterministic in
    doc_id, so both variants see the identical graph."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(kdir, "documents.parquet")).select(
        "doc_id"
    )
    half = F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0
    hub = docs.where(half).select(
        F.lit(-1).cast("long").alias("src"), F.col("doc_id").alias("dst")
    )
    chain = docs.where(~half).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst")
    )
    return hub.unionByName(chain)


def _cc_star_hub(spark, kdir: str, k: int):
    """large-star/small-star CC on the hub graph. MEASURED LOSER here
    (SCALING.md round-5 table): the hub graph's diameter is ~3, so
    min-label converges in ~3 map-side-combinable rounds while the star
    rewrites shuffle the hub's whole neighbor list every round."""
    from ncpi_whistler_spark.operators.dedup import connected_components_star

    return connected_components_star(_cc_star_edges(spark, kdir))


def _cc_minlabel_hub(spark, kdir: str, k: int):
    """min-label CC contrast on the identical hub graph — the winner on
    low-diameter topologies regardless of hub degree."""
    from ncpi_whistler_spark.operators.dedup import connected_components

    return connected_components(_cc_star_edges(spark, kdir), max_iter=200)


def _cc_chain_edges(spark, kdir: str, seg: int = 128):
    """Adversarial long-diameter topology: chains of ``seg`` consecutive
    doc ids (edge doc→doc+1 except at segment boundaries). Diameter =
    seg-1, the regime where min-label needs ~seg rounds and the star
    rewrite needs ~log(seg)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(kdir, "documents.parquet")).select(
        "doc_id"
    )
    return docs.where(F.pmod("doc_id", F.lit(seg)) != seg - 1).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst")
    )


def _cc_star_chain(spark, kdir: str, k: int):
    from ncpi_whistler_spark.operators.dedup import connected_components_star

    return connected_components_star(_cc_chain_edges(spark, kdir))


def _cc_minlabel_chain(spark, kdir: str, k: int):
    from ncpi_whistler_spark.operators.dedup import connected_components

    return connected_components(_cc_chain_edges(spark, kdir), max_iter=300)


def _sessionize_window_form(spark, kdir: str, k: int):
    """The retired lag/cumsum per-user window form of q19 — the skew
    CONTRAST to the shipped bucketed_session_counts rewrite. Under the
    zipfian corpus (50% of events on one user) this shape serializes
    half the table into one task's sort; the registry q19 bounds every
    task by one user's events in one day."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = spark.read.parquet(os.path.join(kdir, "events.parquet"))
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
    return marked.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


#: sessionize pair → its event-shuffle partition key; the sweep records
#: max rows landing on one key (the single-task bound the skew rewrite
#: exists to break)
_SESSIONIZE_KEYS = {
    "q19_sessionize": ["user_id", "__bkt"],
    "q19w_sessionize_window": ["user_id"],
}


def _sessionize_max_key_rows(spark, kdir: str, name: str) -> int:
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(kdir, "events.parquet"))
    t = F.unix_timestamp(F.col("ts").cast("timestamp"))
    keyed = ev.withColumn("__bkt", (t - (t % F.lit(86_400))))
    return (
        keyed.groupBy(*_SESSIONIZE_KEYS[name])
        .count()
        .agg(F.max("count"))
        .first()[0]
    )


def _plain_user_counts(spark, kdir: str, k: int):
    """GROUP BY user_id COUNT on the (optionally skewed) events — the
    unsalted contrast for q62's salted template. Map-side partial
    aggregation already collapses a hot key per input partition, so this
    is expected to survive zipfian skew; the pair quantifies by how
    much."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(kdir, "events.parquet"))
    return ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))


def _salted_user_counts(spark, kdir: str, k: int):
    """q62's two-phase salted aggregation on the same key."""
    from ncpi_whistler_spark.operators.relational import salted_group_count

    ev = spark.read.parquet(os.path.join(kdir, "events.parquet"))
    return salted_group_count(ev, ["user_id"], salt_buckets=16)


def _semantic_dedup_scaled(spark, kdir: str, k: int):
    """semantic_dedup with the scale knob turned: nlist grows ∝ corpus
    (8k clusters at k×) so cluster occupancy — and therefore candidate
    pairs per cluster — stays constant; assignment is the production
    Arrow matmul. The registry q89 pins nlist=8 for oracle replay, which
    is n²/8 by construction (same contrast pattern as q40/q40x)."""
    from ncpi_whistler_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(os.path.join(kdir, "embeddings.parquet"))
    # nprobe=1 pinned: this sweep measures the occupancy-constant
    # (nlist ∝ n) knob alone, comparable with recorded sweeps;
    # production default is nprobe=8 soft assignment
    return semantic_dedup(emb, threshold=0.4, nlist=8 * k, iters=1, nprobe=1)


def _pack_sequences_scaled(spark, kdir: str, k: int):
    """q90's packing layout at k× corpus (bucketed prefix sum, default
    100k bucket size — the production operating point)."""
    from ncpi_whistler_spark.operators.text import pack_sequences

    docs = spark.read.parquet(os.path.join(kdir, "documents.parquet"))
    return pack_sequences(docs, seq_len=2048)


#: conf keys snapshot/restored around every measured query (the skew-join
#: pair tunes them; nothing may leak into the next measurement)
_JOIN_CONF_KEYS = [
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.autoBroadcastJoinThreshold",
]


def _skew_join(spark, kdir: str, k: int, aqe_skew: bool):
    """orders⋈lineitem sort-merge join + per-priority revenue agg on the
    skew-replicated facts (30% of lineitem rows on ONE orderkey). Forces
    SMJ (no broadcast) and lowers the AQE skew thresholds so the
    splitter can actually engage at local fixture sizes — the mechanism
    under test is AQE's skewed-partition split, not the 256 MB default
    trigger point. Conf is snapshotted/restored by the main loop."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    li = spark.read.parquet(os.path.join(kdir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(kdir, "orders.parquet"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(24,6)"
                )
            ).cast("double").alias("revenue"),
        )
    )


#: entries measured outside the registry: name -> fn(spark, kdir, k)
def _substring_xxhash(spark, kdir: str, k: int):
    """q91's production mode: identical linear window-hash plan, xxhash64
    window keys instead of the oracle-replayable md5-h60 (one JVM
    intrinsic vs a digest per window — the hash is the only difference,
    so this isolates the md5 oracle tax from the operator's scaling)."""
    from ncpi_whistler_spark.operators.dedup import exact_substring_coverage

    docs = spark.read.parquet(os.path.join(kdir, "documents.parquet"))
    return exact_substring_coverage(docs, window=10, hash_fn="xxhash64")


def _dsir_xxhash(spark, kdir: str, k: int):
    """q96's production mode: xxhash64 feature bucketing (registry form
    uses md5-h60 for the DuckDB replay). Model stays 512 rows at any k —
    the scaling axis is the unigram∪bigram feature stream."""
    from pyspark.sql import functions as F

    from ncpi_whistler_spark.operators.selection import dsir_importance_weights

    docs = spark.read.parquet(os.path.join(kdir, "documents.parquet"))
    return dsir_importance_weights(
        docs, target_filter=F.col("lang") == "en", hash_fn="xxhash64"
    )


def _bm25_hot_term(spark, kdir: str, k: int):
    """q97's adversarial skew shape: the query includes the INJECTED hot
    token (present in ~30% of ALL docs under --skew), so the term-filtered
    explode is as large as it can get — 0.3n rows shuffling to one term's
    doc-frequency aggregate plus the per-doc tf groupBy. The plan must
    stay linear (isin() pushdown before the shuffle, TakeOrdered top-k);
    a superlinear exponent here means the hot term serialized a stage."""
    from ncpi_whistler_spark.operators.selection import bm25_topk

    docs = spark.read.parquet(os.path.join(kdir, "documents.parquet"))
    return bm25_topk(docs, ["zqhot1", "data"], k=20)


EXTRA_QUERIES = {
    "q40x_neardup_scaled_bits": _q40_scaled_bits,
    "q97h_bm25_hot_term": _bm25_hot_term,
    "q91x_substring_xxhash": _substring_xxhash,
    "q96x_dsir_xxhash": _dsir_xxhash,
    "q55x_trailing_bucketed": _q55_trailing_bucketed,
    "q62p_plain_user_counts": _plain_user_counts,
    "q62s_salted_user_counts": _salted_user_counts,
    # NB: "q91a/q91b" are round-4 sweep-only names for the AQE skew-join
    # contrast pair (kept for artifact continuity with
    # SCALEBENCH_SKEWJOIN.json) — unrelated to the round-5 registry query
    # q91_exact_substring_dedup.
    "q91a_skew_join_aqe_on": lambda s, d, k: _skew_join(s, d, k, True),
    "q91b_skew_join_aqe_off": lambda s, d, k: _skew_join(s, d, k, False),
    "q19w_sessionize_window": _sessionize_window_form,
    "q79h_cc_star_hub": _cc_star_hub,
    "q79hm_cc_star_minlabel": _cc_minlabel_hub,
    "q79c_cc_star_chain": _cc_star_chain,
    "q79cm_cc_minlabel_chain": _cc_minlabel_chain,
    "q89x_semantic_dedup_scaled": _semantic_dedup_scaled,
    "q90x_pack_sequences": _pack_sequences_scaled,
}

#: the time-series family (events-only queries): replicas get disjoint
#: user ids, so per-replica session/as-of structure is identical to the
#: base corpus and true positives scale exactly k.
EVENTS_QUERIES = [
    "q18_events_hourly",
    "q19_sessionize",
    "q31_events_asof",
    "q55_trailing_hour_window",
    "q55x_trailing_bucketed",
    "q62p_plain_user_counts",
    "q62s_salted_user_counts",
    "q19w_sessionize_window",
]

#: the relational family: FACT tables (lineitem/orders) replicate with
#: strided order keys, dimensions stay 1× — exactly how a warehouse
#: grows (facts accumulate, dims don't), so dim joins must stay
#: broadcast and only fact-side scan/shuffle/agg work may grow.
TPCH_QUERIES = [
    "q01_pricing_summary",
    "q06_topk_orders_per_customer",
    "q15_nation_revenue",
    "q41_nation_trade_pairs",
    "q91a_skew_join_aqe_on",
    "q91b_skew_join_aqe_off",
]
TPCH_DIMS = ["region", "nation", "customer", "supplier", "part"]


def replicate(
    spark,
    sf_dir: str,
    k: int,
    out_dir: str,
    docs: bool = True,
    events: bool = False,
    tpch: bool = False,
    skew: bool = False,
) -> None:
    """Write k structure-preserving replicas of documents + embeddings
    (and, when ``events`` is set, the events table: user/event ids stride
    per replica so sessions, as-of matches, and trailing windows within a
    replica are byte-identical to the base corpus and never cross
    replicas — true positives scale exactly k).

    ``skew=True`` injects a zipfian hot key AFTER replication — the
    uniform-replica sweep can't exercise the skew toolkit (VERDICT r3
    #4): 50% of ALL events land on one global user_id (-1), and ~30% of
    ALL documents gain one identical hot 3-token tail (a shared shingle
    across every replica). Both are deterministic hashes of the row id,
    so reruns see the same skew."""
    from pyspark.sql import functions as F

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    if tpch:
        from ncpi_whistler_spark.catalog import load_table

        # Facts replicate (strided order keys keep the orders⋈lineitem
        # join 1:N within a replica and never across); dims are shared,
        # so per-customer/supplier/part group sizes grow k× — the real
        # shape of warehouse growth.
        li = load_table(spark, sf_dir, "lineitem")
        parts = [
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(r * ID_STRIDE)
            )
            for r in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if skew:
            # 30% of ALL lineitem rows onto ONE orderkey (-1): the
            # classic skewed shuffle join (one reducer partition owns
            # 30% of the fact table unless AQE splits it).
            out = out.withColumn(
                "l_orderkey",
                F.when(
                    F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < 3,
                    F.lit(-1).cast("long"),
                ).otherwise(F.col("l_orderkey")),
            )
        out.write.parquet(os.path.join(out_dir, "lineitem.parquet"))

        o = load_table(spark, sf_dir, "orders")
        parts = [
            o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(r * ID_STRIDE))
            for r in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if skew:
            hot = o.limit(1).withColumn("o_orderkey", F.lit(-1).cast("long"))
            out = out.unionByName(hot)
        out.write.parquet(os.path.join(out_dir, "orders.parquet"))

        for dim in TPCH_DIMS:
            shutil.copy(
                os.path.join(sf_dir, f"{dim}.parquet"),
                os.path.join(out_dir, f"{dim}.parquet"),
            )

    if events:
        from ncpi_whistler_spark.catalog import load_table

        ev = load_table(spark, sf_dir, "events")
        _max_ids = ev.agg(
            F.max("event_id").alias("e"), F.max("user_id").alias("u")
        ).first()
        assert max(_max_ids["e"], _max_ids["u"]) < ID_STRIDE, (
            f"fixture ids exceed ID_STRIDE={ID_STRIDE}; replica ranges "
            "would overlap and merge sessions across replicas"
        )
        # Replicas are shifted 10 years apart as well as user/id-strided:
        # identical ids or overlapping time ranges would MERGE replicas'
        # sessions/windows, and same-range replication grows per-hour
        # DENSITY k× — which makes trailing-window workloads inherently
        # quadratic (every row's window gains k× members; measured: both
        # the window form and the bucketed rewrite went superlinear).
        # Time-shifting holds density constant so the measurement is the
        # ENGINE's volume scaling, with per-replica structure exactly the
        # base corpus's.
        parts = [
            ev.select(
                (F.col("event_id") + F.lit(r * ID_STRIDE)).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {r * 87600} HOURS")).alias("ts"),
                # same stride as ids: a 1e6 stride would overlap replica
                # user ranges at larger fixtures (silently MERGING their
                # sessions/as-of matches and corrupting the measurement);
                # _assert_replica_safe guards the precondition.
                (F.col("user_id") + F.lit(r * ID_STRIDE)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for r in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if skew:
            out = out.withColumn(
                "user_id",
                F.when(
                    F.pmod(F.xxhash64("event_id"), F.lit(2)) == 0, F.lit(-1)
                ).otherwise(F.col("user_id")),
            )
        out.write.parquet(os.path.join(out_dir, "events.parquet"))

    if not docs:
        return

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    parts = []
    for r in range(k):
        p = d
        if r > 0:
            p = p.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1~{r}")
            )
        parts.append(
            p.select(
                (F.col("doc_id") + F.lit(r * ID_STRIDE)).alias("doc_id"),
                "text",
                "lang",
                "source",
                F.length("text").cast("long").alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if skew:
        # hot tail appended AFTER per-replica salting: the same 3 tokens
        # (= at least one identical shingle at any n<=3) in ~30% of docs
        # across ALL replicas — one globally hot shingle key.
        out = out.withColumn(
            "text",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 3,
                F.concat(F.col("text"), F.lit(" zqhot0 zqhot1 zqhot2")),
            ).otherwise(F.col("text")),
        ).withColumn("n_chars", F.length("text").cast("long"))
    out.write.parquet(os.path.join(out_dir, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])
    parts = []
    for r in range(k):
        p = emb
        rot = r % dim
        if rot > 0:
            p = p.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", rot + 1, dim - rot),
                    F.slice("embedding", 1, rot),
                ),
            )
        if r > 0:
            # Deterministic per-replica sign flips (LCG on (r, j)) — an
            # orthogonal transform, so cosines within the replica are
            # untouched while cross-replica cosines cancel to ~0.
            signs = F.array(
                *[
                    F.lit(
                        1.0
                        if ((r * 1103515245 + j * 12345 + 6789) >> 7) & 1
                        else -1.0
                    )
                    for j in range(dim)
                ]
            )
            p = p.withColumn(
                "embedding",
                F.zip_with("embedding", signs, lambda x, s: (x * s).cast("float")),
            )
        parts.append(
            p.select(
                (F.col("vec_id") + F.lit(r * ID_STRIDE)).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.parquet(os.path.join(out_dir, "embeddings.parquet"))


def fit_exponent(points: list[tuple[int, float]]) -> float | None:
    """Least-squares slope of log(t) vs log(k) over the provided points."""
    pts = [(k, t) for k, t in points if k > 0 and t > 0]
    if len(pts) < 2:
        return None
    xs = [math.log(k) for k, _ in pts]
    ys = [math.log(t) for _, t in pts]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return None
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ks", default="1,4,16,64")
    ap.add_argument("--queries", default=",".join(q[:3] for q in DEFAULT_QUERIES))
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--workdir", default="/root/repo/.scalebench")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--skew",
        action="store_true",
        help="inject a zipfian hot key (50%% of events on one user; one "
        "hot shingle in 30%% of docs) into the replicated corpus",
    )
    ap.add_argument("--keep", action="store_true", help="keep replicated parquet")
    ap.add_argument(
        "--repeats",
        type=int,
        default=1,
        help="time each (query, k) N times and record the min (de-noises "
        "JIT warm-up and machine-load swings)",
    )
    args = ap.parse_args()
    if args.out is None:
        args.out = "SCALEBENCH_SKEW.json" if args.skew else "SCALEBENCH.json"

    from ncpi_whistler_spark.session import get_spark
    from ncpi_whistler_spark.queries import REGISTRY

    ks = sorted({int(k) for k in args.ks.split(",")})
    curated = (
        DEFAULT_QUERIES
        + [n for n in EVENTS_QUERIES if n not in DEFAULT_QUERIES]
        + [n for n in TPCH_QUERIES if n not in DEFAULT_QUERIES]
    )
    # any registry query or EXTRA variant is sweepable by exact/prefix name,
    # not just the curated pool (new operators get sweeps without edits
    # here). `all` stays the CURATED pool — the full registry includes
    # streaming drains and iterative driver loops that make no sense in a
    # k×-replication sweep.
    pool = curated + [
        n for n in list(REGISTRY) + list(EXTRA_QUERIES) if n not in curated
    ]
    wanted = [w.strip() for w in args.queries.split(",") if w.strip()]
    if wanted == ["all"]:
        names = curated
    else:
        names = [n for n in pool if any(n == w or n.startswith(w) for w in wanted)]
    need_events = any(n in EVENTS_QUERIES for n in names)
    need_tpch = any(n in TPCH_QUERIES for n in names)
    need_docs = any(
        n not in EVENTS_QUERIES and n not in TPCH_QUERIES for n in names
    )
    # queries outside the curated lists have unknown table needs (they may
    # read events or TPC-H tables despite not being in the curated lists) —
    # replicate everything rather than crash mid-sweep on a missing path
    if any(n not in curated for n in names):
        need_events = need_tpch = need_docs = True
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {n: {"secs": {}, "rows": {}} for n in names}
    base_docs = spark.read.parquet(
        os.path.join(args.sf_dir, "documents.parquet")
    ).count()
    for k in ks:
        kdir = os.path.join(args.workdir, f"{k}x")
        t0 = time.time()
        replicate(
            spark,
            args.sf_dir,
            k,
            kdir,
            docs=need_docs,
            events=need_events,
            tpch=need_tpch,
            skew=args.skew,
        )
        print(f"[scalebench] built {k}x corpus ({base_docs * k} docs) "
              f"in {time.time() - t0:.1f}s", flush=True)
        for n in names:
            best = None
            conf_snapshot = {
                key: spark.conf.get(key, None) for key in _JOIN_CONF_KEYS
            }
            for _ in range(max(1, args.repeats)):
                spark.catalog.clearCache()
                t0 = time.time()
                # Timed action is a noop WRITE, not count(): count() lets
                # Catalyst prune cardinality-preserving operators (a pure
                # window/project query would never execute at all).
                if n in EXTRA_QUERIES:
                    df = EXTRA_QUERIES[n](spark, kdir, k)
                else:
                    df = REGISTRY[n][0](spark, kdir)
                df.write.format("noop").mode("overwrite").save()
                secs = time.time() - t0
                best = secs if best is None else min(best, secs)
            rows = df.count()  # untimed, result-size bookkeeping only
            for key, val in conf_snapshot.items():
                if val is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, val)
            results[n]["secs"][k] = round(best, 3)
            results[n]["rows"][k] = rows
            if n in _SESSIONIZE_KEYS:
                mkr = _sessionize_max_key_rows(spark, kdir, n)
                results[n].setdefault("max_key_rows", {})[k] = mkr
                print(f"[scalebench] {n} k={k}: max rows on one "
                      f"shuffle key = {mkr}", flush=True)
            print(f"[scalebench] {n} k={k}: {best:.2f}s, {rows} rows", flush=True)
        if not args.keep:
            shutil.rmtree(kdir, ignore_errors=True)

    # exponent over the non-warm-up points (drop k=min when >2 points:
    # the smallest run is overhead/JIT-dominated locally)
    report = {
        "sf_dir": args.sf_dir,
        "ks": ks,
        "base_docs": base_docs,
        "skew": bool(args.skew),
        "queries": {},
    }
    for n in names:
        pts = sorted((k, s) for k, s in results[n]["secs"].items())
        fit_pts = pts[1:] if len(pts) > 2 else pts
        report["queries"][n] = {
            "secs": {str(k): s for k, s in pts},
            "rows": {str(k): results[n]["rows"][k] for k, _ in pts},
            "exponent": (
                round(e, 3) if (e := fit_exponent(fit_pts)) is not None else None
            ),
        }
        if "max_key_rows" in results[n]:
            report["queries"][n]["max_key_rows"] = {
                str(k): v for k, v in sorted(results[n]["max_key_rows"].items())
            }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
