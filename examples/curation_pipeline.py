"""End-to-end training-data curation over the fixture corpus — the
"switching from per-query usage to a pipeline" example.

Composes the engine's LLM-pipeline operators the way a pretraining data
run would: quality gates → repetition gates → fuzzy dedup → LM
perplexity bucketing → training-mix resampling → sequence packing, all
as ONE lazy DataFrame plan per stage (nothing materializes until the
final write), then prints a per-stage funnel and writes the packed
training windows as parquet.

Run:  PYTHONPATH=/root/repo python examples/curation_pipeline.py \
          [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.01  /tmp/curated
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import functions as F


def curate(spark, sf_dir: str, out_dir: str) -> dict:
    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.operators.dedup import fuzzy_dedup_keep
    from ncpi_whistler_spark.operators.selection import (
        apply_corpus_mix,
        bigram_lm_scores,
        corpus_mix,
    )
    from ncpi_whistler_spark.operators.text import (
        gopher_quality_flags,
        gopher_repetition_profile,
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents")
    funnel = {"input": docs.count()}

    # 1. Gopher quality rules (map-side flags; keep passing docs —
    # the flags frame carries only doc_id + per-rule booleans).
    # Thresholds relaxed for the synthetic fixture corpus (short docs
    # from a 31-word vocabulary with one English stopword); production
    # corpora use the paper defaults.
    flagged = gopher_quality_flags(
        docs, min_words=10, min_mean_word_len=1.0, min_stopword_hits=1
    )
    kept = docs.join(flagged.where("keep").select("doc_id"), on="doc_id").select(
        "doc_id", "text", "lang", "source"
    )
    funnel["quality"] = kept.count()

    # 2. Gopher repetition gates (top-n-gram / dup-n-gram coverage)
    rep = gopher_repetition_profile(kept)
    unrep = kept.join(rep.where("keep").select("doc_id"), on="doc_id")
    funnel["repetition"] = unrep.count()

    # 3. Fuzzy dedup (MinHash-LSH candidates → exact verify → keeper)
    deduped = fuzzy_dedup_keep(unrep, threshold_ppm=800_000)
    funnel["dedup"] = deduped.count()

    # 4. LM perplexity buckets; drop the noisy tail (CCNet recipe)
    scored = bigram_lm_scores(deduped)
    headmid = deduped.join(
        scored.where(F.col("bucket") != "tail").select("doc_id"), on="doc_id"
    )
    funnel["lm_head_middle"] = headmid.count()

    # 5. Training-mix resampling: report AND the actual sampled subset
    targets = {"en": 400_000, "de": 150_000, "es": 150_000, "fr": 150_000, "zh": 150_000}
    mix = corpus_mix(headmid, targets, group_col="lang")
    funnel["mix"] = {
        r["lang"]: {"rate_ppm": r["rate_ppm"], "n_kept": r["n_kept"]}
        for r in mix.collect()
    }
    mixed = apply_corpus_mix(headmid, targets, group_col="lang")
    funnel["mixed"] = mixed.count()

    # 6. Pack the MIXED corpus into fixed training windows and write.
    # pack_sequences emits one placement row per document; the window
    # count is the last window index + 1.
    packed = pack_sequences(mixed, seq_len=128)
    packed.write.mode("overwrite").parquet(out_dir)
    placements = spark.read.parquet(out_dir)
    funnel["docs_packed"] = placements.count()
    funnel["train_windows"] = (
        placements.agg(F.max("end_seq")).collect()[0][0] or -1
    ) + 1
    return funnel


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated"
    from ncpi_whistler_spark import get_spark

    spark = get_spark(app_name="curation_pipeline")
    print(json.dumps(curate(spark, sf_dir, out_dir)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
