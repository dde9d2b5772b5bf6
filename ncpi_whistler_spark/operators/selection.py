"""Corpus-model-based scoring and data-selection operators.

The three operators here share one shape: a *model* is aggregated from the
corpus itself (bigram counts, hashed-feature histograms, document
frequencies), converted to per-key INTEGER micro-nat log scores once, and
then joined back to per-document feature counts. Because every per-row
value is a BIGINT before any SUM, the aggregation is order-insensitive —
bit-identical under any partial-aggregation schedule, and replayable in
ANSI SQL (the registry oracles in queries.py replay each one in DuckDB).

Scale notes (100 TB):
  * Model tables are vocabulary-sized, not corpus-sized — they broadcast
    when small and hash-join on the feature key otherwise (AQE decides).
  * Scoring is map-side after the model join: one shuffle on the feature
    key, one on doc_id. No window over a global ordering anywhere; the
    BM25 top-k uses orderBy+limit, which Spark executes as TakeOrdered
    (per-partition partial top-k, no global sort).
  * The single ``ln`` per model key is evaluated once per DISTINCT key
    (vocabulary cardinality), never per document row.

Float determinism: doubles appear only inside ``floor(1e6 * ln(p))`` where
``p`` is an exact integer ratio — the division and ln are deterministic
per-engine, and the floor-to-BIGINT quantization makes the value stable
under last-ulp ln differences across engines (verified empirically by the
oracle replay at three scale factors).

Reference parity: the reference engine (NIH-NCPI/ncpi-whistler) has no
corpus-LM, importance-sampling, or retrieval-scoring operators; these are
part of the LLM-training-pipeline extension surface (SURVEY.md §2.11),
modeled on CCNet (Wenzek et al. 2020), DSIR (Xie et al. 2023), and
Robertson/Sparck-Jones BM25.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ncpi_whistler_spark.operators.dedup import _base_hash
from ncpi_whistler_spark.operators.text import tokens

#: micro-nat scale: floor(1e6 * ln p) quantizes log-probabilities onto an
#: integer lattice shared by Spark and DuckDB.
MICRO = 1_000_000


def _toks_df(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, toks) — token ARRAY per document, the shared map-side base
    every operator here starts from. Keeping tokens as an array (instead
    of a posexplode) lets adjacent-pair construction stay a zip_with over
    the array: zero shuffles before the model aggregation, where the
    lead()-window alternative re-shuffles and sorts the whole token
    stream by doc just to stitch neighbors (measured contrast in
    SCALING.md: the window form was the dominant cost of q95/q96)."""
    return df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))


def _bigram_pairs(tdf: DataFrame) -> DataFrame:
    """(id, w1, w2) adjacent-token pairs, map-side: zip the token array
    with itself shifted by one (slice+zip_with), then one explode."""
    n = F.size("toks")
    pairs = F.zip_with(
        F.slice("toks", 1, n - 1),
        F.slice("toks", 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        tdf.where(n >= 2)
        .select("id", F.explode(pairs).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def _lp_micronats(num: Column, den: Column) -> Column:
    """floor(1e6 * ln(num/den)) as BIGINT. num < den ⇒ always ≤ -1."""
    return F.floor(F.lit(MICRO) * F.log(num.cast("double") / den.cast("double"))).cast("long")


# --------------------------------------------------------------------------
# Bigram language-model perplexity (CCNet-style head/middle/tail buckets)
# --------------------------------------------------------------------------


def bigram_lm_model(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Train the add-one-smoothed bigram LM — the FREEZABLE half of the
    CCNet recipe. Returns the (w1, w2, lp_u) model table where
    lp_u = floor(1e6·ln((c2+1)/(c1+V))), exactly the table
    :func:`bigram_lm_scores` trains internally when ``model=None``.

    Production shape: train this ONCE on a calibration corpus (CCNet
    trains KenLM on Wikipedia, not on the corpus being scored), persist
    it, and pass it to ``bigram_lm_scores(model=...)`` — then scoring a
    100 TB corpus never aggregates that corpus's bigram vocabulary; the
    only corpus-wide work is the per-document feature count. The model
    is vocabulary-sized: it broadcasts when small and hash-joins on
    (w1, w2) otherwise (AQE decides — the q96 broadcast-model
    precedent)."""
    tdf = df.select(F.lit(0).alias("id"), tokens(text_col).alias("toks"))
    tok = tdf.select(F.explode("toks").alias("tok"))
    bg = _bigram_pairs(tdf).select("w1", "w2")
    c1 = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    return _lm_table(c1, c2, vocab)


def _lm_table(c1: DataFrame, c2: DataFrame, vocab: DataFrame) -> DataFrame:
    """Assemble the (w1, w2, lp_u) add-one-smoothed model from unigram
    counts (tok, c1), bigram counts (w1, w2, c2) and the single-row
    vocabulary size (v). The ONE place the smoothing formula lives —
    :func:`bigram_lm_model` and the self-trained path of
    :func:`bigram_lm_scores` both go through it, so a future smoothing
    tweak cannot silently diverge the two."""
    return (
        c2.join(c1.withColumnRenamed("tok", "w1"), on="w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            _lp_micronats(F.col("c2") + 1, F.col("c1") + F.col("v")).alias("lp_u"),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cutoffs_u: tuple[int, int] = (3_390_000, 3_420_000),
    model: DataFrame | None = None,
    oov_lp_u: int = -20_000_000,
) -> DataFrame:
    """Per-document cross-entropy under an add-one-smoothed bigram LM
    trained on the corpus itself, with CCNet-style head/middle/tail
    bucketing at fixed micro-nat cutoffs.

    CCNet (Wenzek et al. 2020) scores documents with a KenLM 5-gram and
    splits the corpus into head/middle/tail perplexity terciles; the
    production recipe freezes the two cutoff values from a calibration
    sample so the split is a pure map-side comparison. This operator is
    that recipe with a bigram model: P(w2|w1) = (c2(w1,w2)+1)/(c1(w1)+V),
    per-bigram log-probs quantized to integer micro-nats BEFORE summing
    (order-insensitive, oracle-replayable), and

        ce_u = (-Σ lp_u) div n_bigrams      (micro-nats / bigram)

    Plan: one posexplode; the unigram/bigram model tables are aggregates
    of that same explode (vocab-sized, broadcast-or-hash joined back);
    scoring is one groupBy(id). The vocabulary size V rides in as a
    broadcast single-row crossJoin (no driver collect). Docs with <2
    tokens get ce_u = 0 / bucket 'head' (nothing to score).

    ``model`` — the PRODUCTION path (CCNet's actual recipe: score
    against a FIXED pretrained LM, never the corpus being scored): pass
    a frozen (w1, w2, lp_u) table from :func:`bigram_lm_model` and
    scoring runs with ZERO corpus-wide model aggregation — the corpus
    is touched only by the per-doc bigram counts, and the model joins
    broadcast-or-hash on (w1, w2). Bigrams absent from the frozen model
    score ``oov_lp_u`` (default −20 nats, a deep closed-vocabulary
    penalty) and still count in n_bigrams — so OOV-heavy docs land in
    the tail, they don't silently shrink their denominator. When the
    frozen model equals the corpus-trained one, output is IDENTICAL to
    ``model=None`` (test-pinned; no bigram is OOV by construction).

    Returns: (doc_id, n_bigrams, ce_u, bucket).
    """
    # the tokenize pass (regexp split over every document) is the
    # dominant map cost and feeds FOUR subtrees in the self-trained
    # shape (per-doc bigram counts, unigram counts, global bigram
    # counts, vocabulary size) — without materialization each broadcast
    # build re-tokenizes the corpus (measured: four ~0.3-0.7 s 1-task
    # jobs at sf0.1). Spread the single-file input, tokenize ONCE into a
    # persisted (id, toks) frame, and derive everything from it
    # (guide §2.4/§5; cache lifetime as in gopher_repetition_profile).
    from ncpi_whistler_spark.operators.tuning import (
        materialize_shared,
        spread_small_input,
    )

    tdf = _toks_df(spread_small_input(df), text_col, id_col)
    if model is None:
        tdf = materialize_shared(tdf)
    bg = _bigram_pairs(tdf)
    bgc = bg.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("n"))

    if model is None:
        # self-trained model (the oracle-replayable registry shape) —
        # the smoothing formula lives in _lm_table, shared with
        # bigram_lm_model (one definition, so a future smoothing tweak
        # cannot silently diverge the two paths). Global bigram counts
        # fold over the per-doc counts (same sums, one explode instead
        # of two); unigram counts and V share the persisted tokens.
        bgc = materialize_shared(bgc)
        c1 = materialize_shared(
            tdf.select(F.explode("toks").alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c1"))
        )
        vocab = c1.agg(F.count(F.lit(1)).alias("v"))
        c2 = bgc.groupBy("w1", "w2").agg(F.sum("n").alias("c2"))
        lp = _lm_table(c1, c2, vocab)
        how = "inner"  # self-trained ⇒ every scored bigram is in-model
    else:
        lp = model.select("w1", "w2", F.col("lp_u").cast("long").alias("lp_u"))
        how = "left"  # frozen model ⇒ unseen bigrams take the OOV score

    joined = bgc.join(lp, on=["w1", "w2"], how=how)
    if model is not None:
        joined = joined.withColumn(
            "lp_u", F.coalesce("lp_u", F.lit(int(oov_lp_u)))
        )
    scored = (
        joined
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.sum(F.col("n") * F.col("lp_u")).alias("s_u"),
        )
        .select(
            "id",
            "n_bigrams",
            F.expr("(-s_u) div n_bigrams").cast("long").alias("ce_u"),
        )
    )
    head_max, mid_max = cutoffs_u
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("ce_u", F.lit(0)).cast("long").alias("ce_u"),
        )
        .withColumn(
            "bucket",
            F.when(F.col("ce_u") <= head_max, F.lit("head"))
            .when(F.col("ce_u") <= mid_max, F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
    )


# --------------------------------------------------------------------------
# DSIR hashed n-gram importance weights
# --------------------------------------------------------------------------


def dsir_importance_weights(
    df: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 512,
    hash_fn: str = "md5",
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023):
    estimate how target-like each document is via hashed n-gram features.

    Features are unigrams ∪ bigrams hashed into ``num_buckets`` buckets.
    Two histograms are aggregated — the target slice (rows matching
    ``target_filter``) and the full raw corpus — and each bucket gets one
    integer log-ratio

        lw_u[k] = floor(1e6·ln((t_k+1)/(T+B))) − floor(1e6·ln((r_k+1)/(R+B)))

    (floors taken separately so both terms are exact BIGINTs). A
    document's importance weight is then the feature-count-weighted sum
    of bucket scores — pure integer arithmetic after the model join:

        weight_u = Σ_features n·lw_u[bucket]

    ``selected`` = weight_u > 0 (log importance ratio favors target).

    Plan: one posexplode feeds both feature grains; bucket histograms are
    two aggregates of the same feature stream (the target one filtered
    BEFORE the shuffle, so it costs a fraction of a pass); the model is
    at most ``num_buckets`` rows — broadcast to the scoring join. T/R
    totals ride in as broadcast single-row crossJoins. hash_fn='md5'
    (h60) keeps bucket assignment replayable in DuckDB; production uses
    hash_fn='xxhash64' (JVM intrinsic).

    Degenerate target: if ``target_filter`` matches zero rows the target
    histogram is empty and T coalesces to 0, so every bucket scores the
    uniform smoothed target ln(1/B) against the raw model — weights are
    well-defined (typically all ≤ 0, so ``selected`` is all-false), not
    NULL. Callers that consider an empty target slice an error should
    validate it themselves; this operator stays single-pass and lazy
    rather than forcing an eager count on the corpus.

    Returns: (doc_id, n_feats, weight_u, selected).
    """
    # the target flag rides through the explode as a map-side column on
    # the source row — no per-doc flag join (a second doc-scale shuffle)
    # and no per-doc broadcast (corpus-sized, wrong at 100 TB). Both
    # feature grains are map-side array ops over ONE per-token hash pass:
    # each token is digested once (transform), unigram buckets come
    # straight from that hash, and bigram buckets pack the two adjacent
    # token hashes' low 30 bits into one exact 60-bit key — no bigram
    # string is ever concatenated or digested, and no window sort exists
    # anywhere. The per-token digest is the dominant map cost, so a
    # single-file input is spread first (no-op at production widths).
    from ncpi_whistler_spark.operators.tuning import (
        materialize_shared,
        spread_small_input,
    )

    df = spread_small_input(df)
    toks = tokens(text_col)
    tdf = df.select(
        F.col(id_col).alias("id"),
        target_filter.cast("boolean").alias("is_t"),
        F.transform(toks, lambda t: _base_hash(t, hash_fn)).alias("th"),
    )
    n = F.size("th")
    uni = tdf.select("id", "is_t", F.explode("th").alias("fh"))
    bi = tdf.where(n >= 2).select(
        "id",
        "is_t",
        F.explode(
            F.zip_with(
                F.slice("th", 1, n - 1),
                F.slice("th", 2, n - 1),
                lambda a, b: F.pmod(a, F.lit(1 << 30)) * F.lit(1 << 30)
                + F.pmod(b, F.lit(1 << 30)),
            )
        ).alias("fh"),
    )
    feats = uni.unionByName(bi).select(
        "id",
        "is_t",
        F.pmod(F.col("fh"), F.lit(num_buckets)).alias("bucket"),
    )
    # fc is consumed by FIVE downstream subtrees (raw, tgt, both totals,
    # and the scoring join), and without materialization each broadcast
    # build re-runs the whole digest+explode+aggregate pipeline
    # (measured: five ~1 s 2-task jobs at sf0.1 — the md5 pass times 5).
    # The compacted per-(doc, bucket) counts — orders of magnitude
    # smaller than the feature stream — are computed ONCE behind an
    # eager barrier (materialize_shared; the r12 lazy persist still
    # raced under AQE's concurrent broadcast-build jobs on a cold
    # cache — guide §5: reused AND expensive to recompute).
    fc = materialize_shared(
        feats.groupBy("id", "is_t", "bucket").agg(F.count(F.lit(1)).alias("n"))
    )

    raw = fc.groupBy("bucket").agg(F.sum("n").alias("r_k"))
    tgt = fc.where("is_t").groupBy("bucket").agg(F.sum("n").alias("t_k"))
    totals = raw.agg(F.sum("r_k").alias("R")).crossJoin(
        tgt.agg(F.sum("t_k").alias("T"))
    )

    b = F.lit(num_buckets)
    model = (
        raw.join(tgt, on="bucket", how="left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                _lp_micronats(
                    F.coalesce("t_k", F.lit(0)) + 1,
                    F.coalesce("T", F.lit(0)) + b,
                )
                - _lp_micronats(F.col("r_k") + 1, F.col("R") + b)
            ).alias("lw_u"),
        )
    )

    scored = (
        fc.join(F.broadcast(model), on="bucket")
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.sum(F.col("n") * F.col("lw_u")).alias("weight_u"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("weight_u", F.lit(0)).cast("long").alias("weight_u"),
        )
        .withColumn("selected", F.col("weight_u") > 0)
    )


# --------------------------------------------------------------------------
# BM25 keyword retrieval scoring
# --------------------------------------------------------------------------

#: BM25 constants as exact rationals: k1 = 12/10, b = 3/4. With num/den
#: cleared through 10·S (S = corpus token count) the whole tf-side is
#: BIGINT arithmetic; ln appears only in the per-term IDF (|terms| calls
#: total). Safe while idf_u·22·S·tf < 2⁶³ — i.e. corpora to ~10⁹ tokens
#: at tf ≤ 10³; beyond that, rescale MICRO down (the production knob).
BM25_K1_TENTHS = 12
BM25_B_QUARTERS = 3


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25
    (Lucene-form idf · saturated tf, k1=1.2, b=0.75), integer-exact.

        idf_u(t)  = floor(1e6·ln(1 + (N−df+0.5)/(df+0.5)))
        score_u   = Σ_t idf_u(t) · 22·S·tf div (10·S·tf + 3·S + 9·dl·N)

    The ``1 +`` inside the ln is Lucene's non-negativity fix: it keeps
    idf_u ≥ 0 even for terms in more than half the corpus, which in turn
    keeps the integer division's numerator non-negative — Spark's ``div``
    truncates toward zero while DuckDB's ``//`` floors, so a negative
    numerator would diverge between engine and oracle.

    where dl is the document token count, N the corpus size, S the total
    token count (avgdl = S/N kept as the exact rational, never a float).

    Plan: the token explode is filtered to the query terms BEFORE any
    shuffle (an isin() pushdown — at 100 TB this is the difference
    between shuffling the corpus and shuffling the hit list); df/dl/N/S
    are aggregates joined back via broadcast; the final top-k is
    orderBy+limit ⇒ TakeOrdered (per-partition partial top-k, no global
    sort). Ties break on doc_id ascending for determinism.

    Returns: k rows of (doc_id, n_terms_hit, score_u).
    """
    tdf = _toks_df(df, text_col, id_col)
    # dl is a map-side size(), not a groupBy over an explode — the only
    # corpus-wide aggregate is the 1-row (N, S) reduce
    dl = tdf.select("id", F.size("toks").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("N"), F.sum("dl").alias("S")
    )

    hits = tdf.select("id", F.explode("toks").alias("tok")).where(
        F.col("tok").isin([t.lower() for t in terms])
    )
    tf = hits.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    idf = dfreq.crossJoin(F.broadcast(corpus)).select(
        "tok",
        F.floor(
            F.lit(MICRO)
            * F.log(
                F.lit(1.0)
                + (F.col("N") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
        )
        .cast("long")
        .alias("idf_u"),
    )

    scored = (
        tf.join(F.broadcast(idf), on="tok")
        .join(dl, on="id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "id",
            "tok",
            F.expr(
                "idf_u * (22 * S * tf) div (10 * S * tf + 3 * S + 9 * dl * N)"
            ).alias("contrib_u"),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum("contrib_u").alias("score_u"),
        )
    )
    return (
        scored.orderBy(F.col("score_u").desc(), F.col("id").asc())
        .limit(k)
        .select(
            F.col("id").alias(id_col),
            F.col("n_terms_hit").cast("long"),
            F.col("score_u").cast("long"),
        )
    )


# --------------------------------------------------------------------------
# Training-mix resampling (target corpus proportions → deterministic rates)
# --------------------------------------------------------------------------

#: the multiplicative hash q63/q69 use for deterministic splits/sampling
MIX_HASH_MULT = 2654435761


def corpus_mix(
    df: DataFrame,
    targets_ppm: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resample a corpus to target group proportions (the pretraining
    data-mixing step: "make the training set 40% en, 15% each of the
    rest") by pure DOWN-sampling, deterministically and integer-exactly.

    Given target proportions t_g (ppm, summing to 1e6) and observed
    counts n_g, the largest achievable mixed corpus is
    T = min_g floor(n_g·1e6 / t_g); each group then keeps
    kept_g = floor(T·t_g / 1e6) documents via a rate_ppm_g =
    floor(kept_g·1e6 / n_g) multiplicative-hash predicate (the q63/q69
    hash, so membership is reproducible across runs AND engines). Groups
    absent from ``targets_ppm`` are dropped (rate 0).

    Every quantity is BIGINT arithmetic — the whole computation replays
    in ANSI SQL. Plan shape: one |groups|-sized counts aggregate, a
    1-row min() reduce for T (broadcast crossJoin), rates broadcast back
    to the row stream, selection map-side. At 100 TB the sampled subset
    streams straight to its writer; nothing corpus-sized shuffles.

    Output: one row per group —
    (group_col, n_total, target_ppm, rate_ppm, n_kept, min_kept_id).
    """
    rates = corpus_mix_rates(df, targets_ppm, group_col)
    keep = _mix_keep(id_col)
    return (
        df.select(group_col, id_col)
        .join(F.broadcast(rates), on=group_col, how="right")
        .groupBy(group_col, "n_total", "target_ppm", "rate_ppm")
        .agg(
            F.sum(keep.cast("long")).alias("n_kept"),
            F.min(F.when(keep, F.col(id_col))).alias("min_kept_id"),
        )
        .select(
            group_col,
            F.col("n_total").cast("long"),
            F.col("target_ppm").cast("long"),
            F.col("rate_ppm").cast("long"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.col("min_kept_id").cast("long"),
        )
    )


def corpus_mix_rates(
    df: DataFrame,
    targets_ppm: dict[str, int],
    group_col: str = "lang",
) -> DataFrame:
    """Per-group sampling rates for ``corpus_mix`` — see there for the
    math. Validates that the target proportions sum to exactly 1e6 ppm,
    and includes EVERY target group in the computation even when it is
    absent from the corpus: a missing target group means the requested
    mix is unachievable at any size, so T — and every rate — is 0
    (rather than silently renormalizing over the groups that exist).

    Output: (group_col, n_total, target_ppm, rate_ppm), one row per
    group present in the corpus OR named in the targets."""
    total = sum(targets_ppm.values())
    if total != 1_000_000:
        raise ValueError(
            f"targets_ppm must sum to 1_000_000 ppm, got {total} "
            f"({targets_ppm})"
        )
    spark = df.sparkSession
    tdf = spark.createDataFrame(
        sorted(targets_ppm.items()), f"{group_col} string, target_ppm long"
    )
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_total"))
        .join(F.broadcast(tdf), on=group_col, how="full")
        .select(
            group_col,
            F.coalesce("n_total", F.lit(0)).alias("n_total"),
            F.coalesce("target_ppm", F.lit(0)).alias("target_ppm"),
        )
    )
    tmax = counts.where(F.col("target_ppm") > 0).agg(
        F.min(
            F.expr("(n_total * 1000000) div target_ppm")
        ).alias("t_max")
    )
    return (
        counts.crossJoin(F.broadcast(tmax))
        .withColumn(
            "rate_ppm",
            F.when(
                (F.col("target_ppm") > 0) & (F.col("n_total") > 0),
                F.expr(
                    "(((t_max * target_ppm) div 1000000) * 1000000) div n_total"
                ),
            ).otherwise(F.lit(0)),
        )
        .select(group_col, "n_total", "target_ppm", "rate_ppm")
    )


def _mix_keep(id_col: str) -> Column:
    """The deterministic membership predicate shared by the report and
    the apply path (requires a joined ``rate_ppm`` column in scope).
    The id is reduced BEFORE multiplying: ids striped by corpus
    replication (scalebench strides 1e9·r) would overflow int64 under
    ANSI mode if multiplied raw ((6e10)·2654435761 > 2⁶³)."""
    h = ((F.col(id_col) % 1_000_000) * F.lit(MIX_HASH_MULT)) % 1_000_000
    return h < F.col("rate_ppm")


def apply_corpus_mix(
    df: DataFrame,
    targets_ppm: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """The row-level counterpart of ``corpus_mix``: returns the sampled
    SUBSET of ``df`` (all original columns) under the same rates and
    hash predicate the report describes — this is the frame that
    'streams straight to its writer' at 100 TB. Broadcast rates join +
    map-side predicate; nothing corpus-sized shuffles."""
    rates = corpus_mix_rates(df, targets_ppm, group_col)
    return (
        df.join(
            F.broadcast(rates.select(group_col, "rate_ppm")), on=group_col
        )
        .where(_mix_keep(id_col))
        .select(*df.columns)  # the USING join reorders; restore df's shape
    )
