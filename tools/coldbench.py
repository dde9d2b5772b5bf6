"""Cold per-rep isolated timing: like tools/optbench.py but clearCache +
GC before EVERY rep, so persisted intra-query intermediates never serve
a later rep — the number is the true cold-path cost the driver's bench
pays when cache pressure evicts between repeats (VERDICT r12 "what's
wrong" #1/#3).

Usage:
    python tools/coldbench.py q94 q24 ...      # median+min of N cold reps
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_COLD_REPEATS.
Prints one JSON line {name: {"min": s, "med": s, "reps": [...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names_in = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    repeats = int(os.environ.get("SPARK_GRAFT_COLD_REPEATS", "4"))

    from ncpi_whistler_spark import get_spark
    from ncpi_whistler_spark.queries import REGISTRY

    names = []
    for q in names_in:
        full = [n for n in REGISTRY if n == q or n.split("_", 1)[0] == q]
        if not full:
            print(f"unknown query {q!r}", file=sys.stderr)
            return 2
        names.extend(full)

    spark = get_spark(
        app_name="coldbench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    sc = spark.sparkContext
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    out: dict[str, dict] = {}
    for name in names:
        fn, _ = REGISTRY[name]
        # one warm-up at the tiny sf compiles codegen etc. (different
        # plans than the timed sf, so its caches can't serve the reps)
        sc.setJobDescription(f"warmup {name}")
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        reps = []
        for rep in range(repeats):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            time.sleep(0.5)
            sc.setJobDescription(f"{name} cold rep{rep}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
        srt = sorted(reps)
        out[name] = {
            "min": srt[0],
            "med": srt[len(srt) // 2],
            "reps": reps,
        }
        print(f"{name}: min={srt[0]} med={srt[len(srt)//2]} reps={reps}",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
