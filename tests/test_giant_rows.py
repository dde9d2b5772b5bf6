"""Giant-row robustness: one pathological document must not melt a task.

At 100 TB there is always a 4 MB document in the corpus (a concatenated
log, a book, a scraped binary-as-text). Per-row work must stay linear in
document length. Round-8 stress (one ~600k-token doc among 500 normal
ones) found chunk_tokens quadratic: the chunk lambdas referenced the
INLINE ``tokens(text)`` expression, and interpreted HOF lambda bodies
re-evaluate it per chunk — ~9,400 regexp splits of the same 4 MB string
(>9 minutes for one row). Fixed by materializing the token array in a
child projection; these tests pin the linear behavior and the chunk
semantics on a large doc.
"""

from __future__ import annotations

import random
import time

from pyspark.sql import functions as F


def _giant_doc(spark, n_tokens: int):
    rnd = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "omega"]
    text = " ".join(rnd.choice(words) for _ in range(n_tokens))
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_chunk_tokens_linear_in_doc_length(spark):
    """300k tokens → ~4,700 chunks. Pre-fix this re-tokenized the 2 MB
    string once per chunk (minutes); materialized it's a few seconds.
    The 90 s bound is ~20× the observed post-fix time and ~5% of the
    pre-fix time — green only on the linear plan."""
    from ncpi_whistler_spark.operators.text import chunk_tokens

    n_tokens, size, stride = 300_000, 128, 64
    df = _giant_doc(spark, n_tokens)
    t0 = time.time()
    out = chunk_tokens(df, size=size, stride=stride).collect()
    assert time.time() - t0 < 90
    # every stride-start chunk present, all full except the tail
    n_chunks = (n_tokens - (size - stride) + stride - 1) // stride
    assert len(out) == n_chunks
    assert sorted(r["chunk_id"] for r in out) == list(range(n_chunks))
    full = [r for r in out if r["n_tok"] == size]
    assert len(full) >= n_chunks - 1


def test_bpe_over_cap_word_is_opaque_and_fast(spark):
    """A no-whitespace 200k-char 'word' (binary-as-text garbage) must
    not melt BPE: the merge-rewrite aggregate() fold is O(len²) per word
    (pre-cap, ONE 2 MB word hung a merge round >9 minutes). Over
    BPE_MAX_WORD_CHARS the word becomes one opaque symbol: zero pair
    contributions (learned merges identical to the clean corpus) and a
    single-piece segmentation, while its row survives."""
    from ncpi_whistler_spark.operators.text import BPE_EOW, bpe_fit

    clean = [(i, "low lower lowest new newer newest") for i in range(20)]
    df_clean = spark.createDataFrame(clean, "doc_id long, text string")
    df_adv = spark.createDataFrame(
        clean + [(99, "x" * 200_000)], "doc_id long, text string"
    )
    t0 = time.time()
    merges_adv, seg = bpe_fit(df_adv, num_merges=6)
    rows = {r["w"]: r["syms"] for r in seg.collect()}
    assert time.time() - t0 < 60
    merges_clean, _ = bpe_fit(df_clean, num_merges=6)
    assert merges_adv == merges_clean
    assert rows["x" * 200_000] == ["x" * 200_000 + BPE_EOW]


def test_bpe_syms_cap_boundary(spark):
    """Exactly at the cap → character symbols; one char over → one
    opaque symbol."""
    from ncpi_whistler_spark.operators.text import (
        BPE_EOW,
        BPE_MAX_WORD_CHARS,
        bpe_syms,
    )
    from pyspark.sql import functions as F

    at = "a" * BPE_MAX_WORD_CHARS
    over = "a" * (BPE_MAX_WORD_CHARS + 1)
    df = spark.createDataFrame([(at,), (over,)], "w string")
    rows = {len(r["w"]): r["s"] for r in df.select("w", bpe_syms("w").alias("s")).collect()}
    assert rows[BPE_MAX_WORD_CHARS] == ["a"] * BPE_MAX_WORD_CHARS + [BPE_EOW]
    assert rows[BPE_MAX_WORD_CHARS + 1] == [over + BPE_EOW]


def test_chunk_tokens_stride_reconstruction(spark):
    """Concatenating each chunk's first ``stride`` tokens reproduces the
    document's token stream exactly (overlap carries the rest)."""
    from ncpi_whistler_spark.operators.text import chunk_tokens, tokens

    df = _giant_doc(spark, 1_000)
    rows = sorted(
        chunk_tokens(df, size=128, stride=64).collect(),
        key=lambda r: r["chunk_id"],
    )
    rebuilt = []
    for r in rows[:-1]:
        rebuilt.extend(r["chunk"].split(" ")[:64])
    rebuilt.extend(rows[-1]["chunk"].split(" "))  # tail chunk in full
    want = df.select(tokens("text").alias("t")).first()["t"]
    assert rebuilt == want


def test_q104_oracle_mirrors_bpe_cap(spark, tmp_path):
    """ADVICE r8: BPE_MAX_WORD_CHARS is a deliberate engine policy, so the
    q104 oracle must MIRROR it — a corpus containing a >cap word has to
    replay green (one opaque word</w> piece on both sides), not diverge
    silently the day a giant-word fixture appears."""
    import duckdb

    from ncpi_whistler_spark.operators.text import BPE_MAX_WORD_CHARS
    from ncpi_whistler_spark.queries import REGISTRY

    over = "x" * (BPE_MAX_WORD_CHARS + 5)
    rows = [
        (1, "en", f"the {over} and then in the end"),
        (2, "en", f"there and {over} {over} on"),
        (3, "en", "in an era of thin theory"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    path = str(tmp_path / "documents.parquet")
    sdf.coalesce(1).write.parquet(path)

    fn, oracle = REGISTRY["q104_bpe_apply"]
    got = sorted(tuple(r) for r in fn(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    con.close()
    assert got == want
    # and the over-cap word really was opaque: exactly 1 piece, so doc 1's
    # piece count is its token count + extra pieces only from real words
    assert len(got) == 3
