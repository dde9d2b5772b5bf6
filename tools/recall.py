"""Recall measurement for the ANN / embedding-dedup PRODUCTION modes.

SCALING.md's k×-sweeps prove the production knobs (grown bucket bits,
grown nlist, multiprobe) hold cost ~linear — this tool measures the
OTHER axis the 100 TB story needs: how much recall those knobs give up
against exact ground truth, and which configs hold recall ≥ 0.9.

Ground truth is computed in numpy on the driver (the corpus here is a
measurement fixture, thousands of vectors — the full cosine matrix is
exact and takes milliseconds; the production paths under test run
distributed, unchanged). Top-k truth replicates the operators' ordering
(sim desc, neighbor_id asc); pair truth is cos ≥ threshold over i<j.

Outputs RECALL.json:
  {"corpus": n, "dim": d,
   "topk": {"lsh bits=4": {"16": r, "64": r}, ..., "ivf nlist=32 nprobe=4": ...},
   "pairs": {"q40x bits=6": r, "q89x nlist=32 (co-cluster)": r, ...}}

Run: PYTHONPATH=/root/repo python tools/recall.py [--k-rep 4]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def exact_topk_sets(mat: np.ndarray, ids: np.ndarray, k: int) -> set[tuple]:
    """(query_id, neighbor_id) pairs of the exact top-k cosine neighbors
    per query, self excluded, ties broken by neighbor id ascending (the
    operators' ordering)."""
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    np.fill_diagonal(sims, -np.inf)
    out: set[tuple] = set()
    order_ids = np.argsort(ids, kind="stable")  # tie-break: smaller id first
    for qi in range(len(ids)):
        row = sims[qi]
        # sort by (-sim, id): stable sort on id order then by -sim
        idx = order_ids[np.argsort(-row[order_ids], kind="stable")][:k]
        out.update((ids[qi], ids[ni]) for ni in idx)
    return out


def exact_pairs(mat: np.ndarray, ids: np.ndarray, threshold: float) -> set[tuple]:
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(ids), k=1)
    hit = sims[iu] >= threshold
    a, b = iu[0][hit], iu[1][hit]
    return {
        (min(ids[i], ids[j]), max(ids[i], ids[j])) for i, j in zip(a, b)
    }


def sampled_topk_truth(
    mat: np.ndarray, ids: np.ndarray, q_idx: np.ndarray, k: int
) -> set[tuple]:
    """Exact top-k (query, neighbor) pairs for the SAMPLED query rows
    only — recall over a query sample is the standard way to keep exact
    truth O(nq·n) when the corpus outgrows the full n×n matrix. Same
    tie rule as exact_topk_sets (sim desc, neighbor id asc)."""
    norms = np.linalg.norm(mat, axis=1)
    qmat = mat[q_idx]
    sims = (qmat @ mat.T) / np.outer(norms[q_idx], norms)
    for row, qi in enumerate(q_idx):
        sims[row, qi] = -np.inf  # self
    out: set[tuple] = set()
    order_ids = np.argsort(ids, kind="stable")
    for row, qi in enumerate(q_idx):
        idx = order_ids[np.argsort(-sims[row][order_ids], kind="stable")][:k]
        out.update((ids[qi], ids[ni]) for ni in idx)
    return out


def blocked_pairs(mat: np.ndarray, ids: np.ndarray, threshold: float,
                  block: int = 2000) -> set[tuple]:
    """exact_pairs for corpora whose full n×n matrix doesn't fit: row
    blocks against the whole matrix, upper triangle only."""
    n = len(ids)
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / norms[:, None]
    out: set[tuple] = set()
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        sims = unit[lo:hi] @ unit.T
        for row in range(hi - lo):
            i = lo + row
            hit = np.nonzero(sims[row, i + 1:] >= threshold)[0] + i + 1
            out.update(
                (min(ids[i], ids[j]), max(ids[i], ids[j])) for j in hit
            )
    return out


def growth_sweep(args) -> dict:
    """VERDICT r6 item 4: the cost sweeps (SCALEBENCH) prove 'grow nlist
    ∝ corpus' holds cost sublinear; this measures whether it also holds
    RECALL — the fixture corpus grown 4× and 16× with nlist (IVF,
    SemDeDup) and bucket bits (LSH families) grown by the stated rules,
    top-k/pair recall vs exact truth at every size."""
    import pyspark.sql.functions as F

    from ncpi_whistler_spark.operators.dedup import embedding_dup_pairs
    from ncpi_whistler_spark.operators.similarity import (
        cosine_topk_lsh,
        ivf_topk,
        ivf_assign_topn_arrow,
        ivf_train,
        semantic_dedup,
    )
    from ncpi_whistler_spark.session import get_spark
    from tools.scalebench import replicate

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base_k_rep = args.k_rep  # the RECALL fixture (8000 vectors at 4)
    growth: dict = {}
    for g in (1, 4, 16):
        k_rep = base_k_rep * g
        kdir = os.path.join(args.workdir, f"{k_rep}x")
        replicate(spark, args.sf_dir, k_rep, kdir, docs=True)
        emb = spark.read.parquet(
            os.path.join(kdir, "embeddings.parquet")
        ).persist()
        rows = emb.select("vec_id", "embedding").collect()
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        n, dim = mat.shape
        rng = np.random.default_rng(7)
        q_idx = np.sort(rng.choice(n, size=min(400, n), replace=False))
        q_ids = [int(ids[i]) for i in q_idx]
        queries = emb.where(F.col("vec_id").isin(q_ids))
        print(f"[growth] corpus {n} (g={g}), {len(q_idx)} sampled queries",
              flush=True)
        entry: dict = {"corpus": int(n)}

        truth16 = sampled_topk_truth(mat, ids, q_idx, 16)
        lg = max(0, round(np.log2(g)))
        # IVF growth rules under test: (a) constant config — occupancy
        # grows, probed FRACTION constant, recall should hold; (b) the
        # naive 'nlist ∝ n, nprobe fixed' — probed fraction shrinks 1/g;
        # (c) nlist ∝ n with nprobe grown to hold the fraction.
        ivf_configs = {(32, 24), (32 * g, 24), (32 * g, 24 * g)}
        for nlist, nprobe in sorted(ivf_configs):
            t0 = time.time()
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in ivf_topk(queries, emb, k=16, nlist=nlist,
                                  nprobe=nprobe, iters=1).collect()
            }
            r = len(got & truth16) / len(truth16)
            entry[f"ivf nlist={nlist} nprobe={nprobe}"] = round(r, 4)
            print(f"[growth] g={g} ivf nlist={nlist} nprobe={nprobe}: "
                  f"{r:.4f} ({time.time()-t0:.1f}s)", flush=True)

        # LSH: bits grown log2(g) holds bucket occupancy; tables grown
        # alongside to buy the recall the deeper bits give up
        for bits, tables in sorted(
            {(4, 4), (4 + lg, 4), (4 + lg, 4 * (1 + lg))}
        ):
            t0 = time.time()
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in cosine_topk_lsh(
                    queries, emb, k=16, bits=bits, dim=dim,
                    multiprobe=True, tables=tables
                ).collect()
            }
            r = len(got & truth16) / len(truth16)
            entry[f"lsh bits={bits} tables={tables}"] = round(r, 4)
            print(f"[growth] g={g} lsh bits={bits} tables={tables}: {r:.4f} "
                  f"({time.time()-t0:.1f}s)", flush=True)

        # pair ops at the q40/q89 threshold. The measured loss surface is
        # CANDIDATE recall — verification inside embedding_dup_pairs is
        # exact cosine, so end-to-end recall == the fraction of true
        # pairs co-bucketed in >=1 table. Measured from the operator's
        # own per-table bucket ids (hyperplane_bucket_arrow, the
        # operator's seed schedule): O(n·tables) instead of the full
        # candidate join, whose both-vectors-per-pair shuffle is ~1 KB ×
        # |candidates| — measured 200 GB of spill at 32k vectors ×
        # tables=24, a real 100 TB lesson recorded in SCALING.md. At g=1
        # the full operator runs too and must agree with the co-bucketed
        # number (validates the shortcut).
        from ncpi_whistler_spark.operators.similarity import (
            hyperplane_bucket_arrow,
        )

        pair_truth = blocked_pairs(mat, ids, 0.4)
        bits = 4 + lg
        # deeper bits shrink per-table collision prob ~p^2 per +2 bits
        # (p = 1 - θ/π), so the table count must grow alongside — sweep
        # the default and the grown-amplification candidate
        # L = 24·(1+log2 g) (predicted ≥0.9 via 1-(1-p^bits)^L at the
        # 0.4-threshold angle; the sweep measures whether it holds)
        max_tabs = 24 * (1 + lg)
        t0 = time.time()
        bk_rows = emb.select(
            "vec_id",
            *[
                hyperplane_bucket_arrow(
                    F.col("embedding"), dim, bits, 42 + 7919 * t
                ).alias(f"b{t}")
                for t in range(max_tabs)
            ],
        ).collect()
        bk = {
            r["vec_id"]: tuple(r[f"b{t}"] for t in range(max_tabs))
            for r in bk_rows
        }
        for tabs in sorted({24, 24 * (1 + lg), max_tabs}):
            co = sum(
                1
                for a, b in pair_truth
                if any(x == y for x, y in zip(bk[a][:tabs], bk[b][:tabs]))
            )
            r = co / max(1, len(pair_truth))
            entry[
                f"q40x bits={bits} tables={tabs} candidate "
                f"(of {len(pair_truth)} pairs)"
            ] = round(r, 4)
            print(f"[growth] g={g} q40x bits={bits} tables={tabs} "
                  f"co-bucketed: {r:.4f} ({time.time()-t0:.1f}s)", flush=True)
        tabs = 24
        if g == 1:
            got = {
                (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
                for r in embedding_dup_pairs(
                    emb, threshold=0.4, bucket_bits=bits, dim=dim, tables=tabs
                ).collect()
            }
            r_full = len(got & pair_truth) / max(1, len(pair_truth))
            entry[f"q40x bits={bits} tables={tabs} full-operator"] = round(
                r_full, 4
            )
            assert abs(r_full - r) < 0.005, (
                f"co-bucketed shortcut diverges from operator: "
                f"{r:.4f} vs {r_full:.4f}"
            )
            print(f"[growth] g=1 q40x full operator: {r_full:.4f} "
                  f"(shortcut validated)", flush=True)

        # SemDeDup co-listed candidate recall, nlist ∝ n; nprobe at the
        # default AND grown with log2(g) (more lists ⇒ boundary pairs
        # split across more neighbors, so soft assignment must widen)
        nlist_sd = 32 * g
        cents = ivf_train(emb, nlist_sd, 1, "embedding", "vec_id", "blas")
        max_probe = 8 * (1 + lg)
        pl = emb.select(
            "vec_id",
            ivf_assign_topn_arrow(F.col("embedding"), cents, max_probe).alias("p"),
        )
        cid = {r["vec_id"]: tuple(r["p"]) for r in pl.collect()}
        for nprobe_sd in sorted({8, max_probe}):
            co = sum(
                1
                for a, b in pair_truth
                if set(cid[a][:nprobe_sd]) & set(cid[b][:nprobe_sd])
            )
            r = co / max(1, len(pair_truth))
            entry[f"q89x nlist={nlist_sd} nprobe={nprobe_sd} (co-listed)"] = (
                round(r, 4)
            )
            print(f"[growth] g={g} q89x nlist={nlist_sd} nprobe={nprobe_sd}: "
                  f"{r:.4f}", flush=True)
        # the operator itself still runs once at the default (materialize)
        if g == 1:
            semantic_dedup(emb, threshold=0.4, nlist=nlist_sd, iters=1,
                           nprobe=8).count()

        emb.unpersist()
        growth[f"{g}x"] = entry
    return growth


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--k-rep", type=int, default=4,
                    help="replication factor for the measurement corpus")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--workdir", default="/root/repo/.recall")
    ap.add_argument("--out", default="RECALL.json")
    ap.add_argument("--growth", action="store_true",
                    help="corpus-growth recall sweep (4x/16x, knobs grown "
                         "by the SCALING.md rules); merges a 'growth' "
                         "section into --out")
    args = ap.parse_args()

    if args.growth:
        growth = growth_sweep(args)
        report = {}
        try:
            with open(args.out) as fh:
                report = json.load(fh)
        except (OSError, ValueError):
            pass
        report["growth"] = growth
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"[recall] wrote growth section to {args.out}", flush=True)
        return 0

    from pyspark.sql import functions as F

    from ncpi_whistler_spark.operators.dedup import embedding_dup_pairs
    from ncpi_whistler_spark.operators.similarity import (
        cosine_topk_lsh,
        ivf_topk,
        semantic_dedup,
    )
    from ncpi_whistler_spark.session import get_spark
    from tools.scalebench import replicate

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    kdir = os.path.join(args.workdir, f"{args.k_rep}x")
    replicate(spark, args.sf_dir, args.k_rep, kdir, docs=True)
    emb = spark.read.parquet(os.path.join(kdir, "embeddings.parquet")).persist()
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    n, dim = mat.shape
    print(f"[recall] corpus {n} vectors, dim {dim}", flush=True)

    report: dict = {"corpus": int(n), "dim": int(dim), "k_rep": args.k_rep,
                    "topk": {}, "pairs": {}}

    truth = {k: exact_topk_sets(mat, ids, k) for k in (16, 64)}

    def topk_recall(name: str, df_builder) -> None:
        entry = {}
        for k in (16, 64):
            t0 = time.time()
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in df_builder(k).collect()
            }
            r = len(got & truth[k]) / len(truth[k])
            entry[str(k)] = round(r, 4)
            print(f"[recall] {name} k={k}: {r:.4f} ({time.time()-t0:.1f}s)",
                  flush=True)
        report["topk"][name] = entry

    # hyperplane LSH (q29 production): multiprobe on, bits swept around
    # the log2(n)-growth rule, then OR-amplification (L tables) at the
    # production bit width
    for bits, tables in ((4, 1), (6, 1), (8, 1), (4, 4), (4, 8), (6, 8), (6, 16)):
        topk_recall(
            f"lsh bits={bits} tables={tables} multiprobe",
            lambda k, bits=bits, tables=tables: cosine_topk_lsh(
                emb, emb, k=k, bits=bits, dim=dim, multiprobe=True, tables=tables
            ),
        )

    # IVF (q58 production): occupancy-constant nlist, nprobe swept
    for nlist, nprobe in ((8, 4), (32, 4), (32, 8), (32, 16), (32, 24)):
        topk_recall(
            f"ivf nlist={nlist} nprobe={nprobe}",
            lambda k, nl=nlist, np_=nprobe: ivf_topk(
                emb, emb, k=k, nlist=nl, nprobe=np_, iters=1
            ),
        )

    # pair ops at threshold 0.4 (the q40/q89 registry threshold)
    pair_truth = exact_pairs(mat, ids, 0.4)
    print(f"[recall] exact pairs at 0.4: {len(pair_truth)}", flush=True)

    grown_bits = 4 + max(0, round(np.log2(args.k_rep)))
    for bits, tables in (
        (4, 1),
        (grown_bits, 1),
        (4, 8),
        (4, 16),
        (grown_bits, 16),
    ):
        got = {
            (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
            for r in embedding_dup_pairs(
                emb, threshold=0.4, bucket_bits=bits, dim=dim, tables=tables
            ).collect()
        }
        r = len(got & pair_truth) / max(1, len(pair_truth))
        report["pairs"][f"q40x bits={bits} tables={tables}"] = round(r, 4)
        print(f"[recall] q40x bits={bits} tables={tables}: {r:.4f}", flush=True)

    # semantic dedup: measured loss surface is CANDIDATE recall — the
    # fraction of true pairs actually co-listed (a pair can only be
    # deduped if some list holds both). nprobe>1 = soft assignment.
    for nlist, nprobe in ((8, 1), (8 * args.k_rep, 1), (8 * args.k_rep, 2),
                          (8 * args.k_rep, 4), (8 * args.k_rep, 8)):
        sd = semantic_dedup(emb, threshold=0.4, nlist=nlist, iters=1,
                            nprobe=nprobe)
        if nprobe == 1:
            cid = {r["vec_id"]: (r["cid"],) for r in sd.collect()}
        else:
            # recompute the probe lists the operator used
            from ncpi_whistler_spark.operators.similarity import (
                ivf_assign_topn_arrow,
                ivf_train,
            )

            cents = ivf_train(emb, nlist, 1, "embedding", "vec_id", "blas")
            pl = emb.select(
                "vec_id",
                ivf_assign_topn_arrow(F.col("embedding"), cents, nprobe).alias("p"),
            )
            cid = {r["vec_id"]: tuple(r["p"]) for r in pl.collect()}
            sd.count()  # materialize the operator itself too
        co = sum(1 for a, b in pair_truth if set(cid[a]) & set(cid[b]))
        r = co / max(1, len(pair_truth))
        report["pairs"][f"q89x nlist={nlist} nprobe={nprobe} (co-listed)"] = round(r, 4)
        print(f"[recall] q89x nlist={nlist} nprobe={nprobe}: {r:.4f}", flush=True)

    # incremental ingest dedup (q93): CANDIDATE recall of the write-once
    # minhash band index under the production xxhash64 sketch — the
    # fraction of TRUE cross (batch × corpus) near-dup pairs (exact
    # 3-gram Jaccard ≥ 0.8, the q93 threshold) that collide in at least
    # one band. Verification is exact Jaccard, so end-to-end dedup
    # recall == candidate recall. Swept over bands (rows-per-band is the
    # s-curve knob) and batch sizes (recall is per-pair, so it should be
    # flat in batch fraction — measured to confirm).
    from ncpi_whistler_spark.operators.dedup import (
        minhash_band_index,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(os.path.join(kdir, "documents.parquet")).persist()
    truth_all = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.8)
        .select("id_a", "id_b")
        .collect()
    }
    report["ingest"] = {}
    for batch_pct, bands in ((2, 16), (10, 8), (10, 16), (10, 32), (30, 16)):
        is_batch = F.pmod(F.xxhash64("doc_id"), F.lit(100)) < batch_pct
        batch = docs.where(is_batch)
        corpus = docs.where(~is_batch)
        batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
        cross_truth = {
            (a, b)
            for a, b in truth_all
            if (a in batch_ids) != (b in batch_ids)
        }
        if not cross_truth:
            print(f"[recall] q93 batch={batch_pct}%: no cross pairs, skipped",
                  flush=True)
            continue
        bi = minhash_band_index(batch, num_hashes=64, bands=bands)
        ci = minhash_band_index(corpus, num_hashes=64, bands=bands)
        cand = {
            (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
            for r in bi.select("band", "bh", F.col("id").alias("id_a"))
            .join(ci.select("band", "bh", F.col("id").alias("id_b")), on=["band", "bh"])
            .select("id_a", "id_b")
            .distinct()
            .collect()
        }
        r = len(cand & cross_truth) / len(cross_truth)
        key = f"q93 batch={batch_pct}% bands={bands} (of {len(cross_truth)} pairs)"
        report["ingest"][key] = round(r, 4)
        print(f"[recall] {key}: {r:.4f}", flush=True)
    docs.unpersist()

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"[recall] wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
