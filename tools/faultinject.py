"""Batch fault-injection harness: real Spark task retries, injected.

Streaming recovery is covered by streaming/recovery.py + its restart
tests; this tool closes the BATCH half of the fault-tolerance story. It
boots a session on ``local[4,2]`` — the local-mode master form whose
second argument is ``spark.task.maxFailures`` — and wraps hot-path
operator inputs (and one post-shuffle reduce stage) in a pass-through
``mapInPandas`` that raises on the FIRST attempt of one partition's
task. Spark retries the task; the scenario passes only when

  1. the injected failure demonstrably fired (the failing attempt drops
     a marker file before raising), and
  2. the retried run's result is bit-identical to a clean run of the
     same plan on the same session.

That is the at-scale property the operators claim in their docstrings
("deterministic under partial-stage retries"): on a 1000-executor
cluster, task retries and re-scheduled stages are routine — an operator
whose output depends on which attempt survived would silently corrupt
results long before anything crashed. The scenarios cover the
determinism risk classes:

- keeper choice in exact dedup (min-ordering, not "first seen"),
- row_number sequence codes (explicit total order, not arrival order),
- LSH candidate pairs (hash-derived, persist() re-materialization),
- multiplicative-hash splits (pure arithmetic on ids),
- Count-Min sketch build + the shuffle-free estimate chain,
- a post-shuffle aggregation (reduce-stage retry re-fetches map output),
- the parquet sink commit protocol (the failed attempt's files must be
  discarded — exactly-once output, zero duplicate rows).

``--negative-control`` runs one injected scenario on plain ``local[4]``
(maxFailures=1) and asserts the job FAILS — proof the injection is real
and the main run's green is earned, not vacuous.

Usage:
  python -m tools.faultinject [--sf-dir DIR] [--out FAULTS.json]
  python -m tools.faultinject --negative-control

Prints one JSON line; exit 0 iff every scenario matched and fired.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def inject_first_attempt_failure(
    df: DataFrame, marker_dir: str, tag: str, fail_partition: int = 0
) -> DataFrame:
    """Pass-through mapInPandas that kills attempt 0 of one task.

    The failing attempt writes ``<marker_dir>/<tag>.fired`` before
    raising, so callers can assert the failure actually happened (a
    scenario that never fired proves nothing). Retried attempts
    (attemptNumber >= 1) stream batches through untouched — the wrapper
    adds no columns, reorders nothing, and preserves the schema, so the
    surrounding plan is exactly the production plan plus one extra
    map stage.
    """
    schema = df.schema

    def gen(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc.partitionId() == fail_partition and tc.attemptNumber() == 0:
            os.makedirs(marker_dir, exist_ok=True)
            with open(os.path.join(marker_dir, f"{tag}.fired"), "w") as fh:
                fh.write(f"stage={tc.stageId()} attempt={tc.attemptNumber()}")
            raise RuntimeError(f"faultinject: injected failure [{tag}]")
        for pdf in batches:
            yield pdf

    return df.mapInPandas(gen, schema)


def _canon(df: DataFrame) -> list[str]:
    """Order-insensitive exact rendering of a result (repr keeps float
    bits, so equality here is bit-equality)."""
    return sorted(repr(tuple(r)) for r in df.collect())


def _scenarios(spark, sf_dir: str, marker_dir: str, scratch: str):
    """Yield (name, clean_thunk, injected_thunk) triples. Both thunks
    build the SAME logical plan; the injected one wraps a stage input in
    inject_first_attempt_failure."""
    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.operators.dedup import (
        drop_exact_dups,
        minhash_lsh_pairs,
    )
    from ncpi_whistler_spark.operators.profiling import cms_estimate, cms_sketch
    from ncpi_whistler_spark.operators.relational import sequential_codes

    docs = load_table(spark, sf_dir, "documents")
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def inj(df: DataFrame, tag: str) -> DataFrame:
        # spread the input over 4 partitions first: 3 tasks succeed while
        # task 0 fails and retries, so the scenario also proves the
        # surviving tasks' partial progress combines correctly with the
        # retried task's output (the fixture would otherwise scan as a
        # single partition and the retry would be the only task).
        return inject_first_attempt_failure(df.repartition(4), marker_dir, tag)

    # 1. Exact dedup: keeper must be the min-ordered row, not whichever
    #    attempt's row arrived first.
    yield (
        "exact_dedup",
        lambda: _canon(drop_exact_dups(docs)),
        lambda: _canon(drop_exact_dups(inj(docs, "exact_dedup"))),
    )

    # 2. Sequential codes: row_number over an explicit total order.
    def _codes(src: DataFrame) -> DataFrame:
        return sequential_codes(
            src,
            partition_by=["p_brand"],
            order_by=[F.col("p_partkey")],
            prefix_col=F.lit("q"),
        ).select("p_partkey", "p_brand", "code")

    yield (
        "sequential_codes",
        lambda: _canon(_codes(part)),
        lambda: _canon(_codes(inj(part, "sequential_codes"))),
    )

    # 3. LSH candidate pairs: signatures persist()ed inside the operator;
    #    a retry during materialization must not change the pair set.
    def _pairs(src: DataFrame) -> DataFrame:
        return minhash_lsh_pairs(src, num_hashes=16, bands=4)

    yield (
        "lsh_pairs",
        lambda: _canon(_pairs(docs)),
        lambda: _canon(_pairs(inj(docs, "lsh_pairs"))),
    )

    # 4. Deterministic splits (q63 shape): pure integer arithmetic.
    def _splits(src: DataFrame) -> DataFrame:
        h = ((F.col("doc_id") % 100) * F.lit(2654435761)) % 100
        split = F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
        return (
            src.select("doc_id", "lang", split.alias("split"))
            .groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id"))
        )

    yield (
        "splits",
        lambda: _canon(_splits(docs)),
        lambda: _canon(_splits(inj(docs, "splits"))),
    )

    # 5. CMS build + shuffle-free estimate chain (the docstring's
    #    "deterministic under partial-stage retries" claim, now proven).
    qframe = docs.select("lang").distinct()

    def _cms(src: DataFrame) -> DataFrame:
        sk = cms_sketch(src, "lang", depth=4, width=64)
        return cms_estimate(sk, qframe, "lang", depth=4, width=64)

    yield (
        "cms",
        lambda: _canon(_cms(docs)),
        lambda: _canon(_cms(inj(docs, "cms"))),
    )

    # 6. Reduce-stage retry: injection AFTER the groupBy, so the failed
    #    task is a post-shuffle reducer and the retry re-fetches map
    #    output. Partial aggregation must recombine identically.
    def _agg(injected: bool) -> list[str]:
        agg = (
            lineitem.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        if injected:
            # raw injector, NO repartition: an extra round-robin exchange
            # would move the failure past the final-aggregation stage and
            # the retry would re-read already-finalized aggregates instead
            # of re-fetching partial-agg map output (the claim under test)
            agg = inject_first_attempt_failure(agg, marker_dir, "agg_reduce")
        return _canon(agg)

    yield ("agg_reduce", lambda: _agg(False), lambda: _agg(True))

    # 7. Parquet sink exactly-once: the failed attempt's output files
    #    must be discarded by the commit protocol — the read-back equals
    #    a clean write (no duplicate rows, no missing rows).
    proj = lineitem.select("l_orderkey", "l_linenumber", "l_quantity")

    def _sink(injected: bool) -> list[str]:
        out = os.path.join(scratch, "sink_inj" if injected else "sink_clean")
        src = inj(proj, "parquet_sink") if injected else proj
        src.write.mode("overwrite").parquet(out)
        return _canon(spark.read.parquet(out))

    yield ("parquet_sink", lambda: _sink(False), lambda: _sink(True))

    # 8/9. Task retry INSIDE a streaming micro-batch: distinct from the
    #    checkpoint-restart evidence (test_streaming) — here the QUERY
    #    keeps running while the scheduler retries one failed task of a
    #    micro-batch; the drained result must equal the clean replay.
    #    Run under BOTH state-store backends: a task retry re-opens the
    #    failed task's state-store instance, which is provider-specific
    #    code (heap snapshot vs RocksDB working dir).
    def _stream(injected: bool, provider: str) -> list[str]:
        from ncpi_whistler_spark.session import STATE_STORE_PROVIDERS
        from ncpi_whistler_spark.streaming.windows import (
            hourly_counts_stream,
            read_events_stream,
            run_stream_to_memory,
        )

        key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, STATE_STORE_PROVIDERS[provider])
        try:
            stream = read_events_stream(spark, sf_dir)
            if injected:
                stream = inject_first_attempt_failure(
                    stream, marker_dir, f"stream_microbatch_{provider}"
                )
            name = f"fi_stream_{provider}_{'inj' if injected else 'clean'}"
            run_stream_to_memory(hourly_counts_stream(stream), name)
            return _canon(spark.table(name))
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    for prov in ("hdfs", "rocksdb"):
        yield (
            f"stream_microbatch_{prov}",
            lambda p=prov: _stream(False, p),
            lambda p=prov: _stream(True, p),
        )


def run_suite(sf_dir: str, out_path: str | None) -> int:
    from ncpi_whistler_spark import get_spark

    # local[4,2]: 4 task threads, spark.task.maxFailures=2 — ONE retry
    # per task, which is exactly what the injector consumes.
    spark = get_spark(
        app_name="faultinject", master="local[4,2]", shuffle_partitions=8
    )
    marker_dir = tempfile.mkdtemp(prefix="faultinject_markers_")
    scratch = tempfile.mkdtemp(prefix="faultinject_scratch_")
    report: dict = {"master": "local[4,2]", "sf_dir": sf_dir, "scenarios": {}}
    ok = True
    try:
        for name, clean, injected in _scenarios(
            spark, sf_dir, marker_dir, scratch
        ):
            want = clean()
            got = injected()
            fired = os.path.exists(os.path.join(marker_dir, f"{name}.fired"))
            match = want == got
            report["scenarios"][name] = {
                "match": match,
                "fired": fired,
                "rows": len(want),
            }
            ok = ok and match and fired
    finally:
        shutil.rmtree(marker_dir, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()
    report["ok"] = ok
    line = json.dumps(report)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    return 0 if ok else 1


def run_negative_control(sf_dir: str) -> int:
    """On plain local[4] (maxFailures=1) the injected failure must kill
    the job — proving the injector actually fails attempt 0 and the
    main suite's green comes from a real retry, not a no-op wrapper."""
    from ncpi_whistler_spark import get_spark
    from ncpi_whistler_spark.catalog import load_table

    spark = get_spark(
        app_name="faultinject-negctl", master="local[4]", shuffle_partitions=8
    )
    marker_dir = tempfile.mkdtemp(prefix="faultinject_negctl_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        try:
            inject_first_attempt_failure(docs, marker_dir, "negctl").count()
        except Exception:
            fired = os.path.exists(os.path.join(marker_dir, "negctl.fired"))
            print(
                json.dumps(
                    {"negative_control": "failed_as_expected", "fired": fired}
                )
            )
            return 0 if fired else 1
        print(json.dumps({"negative_control": "UNEXPECTED_SUCCESS"}))
        return 1
    finally:
        shutil.rmtree(marker_dir, ignore_errors=True)
        spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR_TEST",
                                           "/root/testdata/sf0.001")
    )
    ap.add_argument("--out", default=None)
    ap.add_argument("--negative-control", action="store_true")
    args = ap.parse_args()
    if args.negative_control:
        return run_negative_control(args.sf_dir)
    return run_suite(args.sf_dir, args.out)


if __name__ == "__main__":
    sys.exit(main())
