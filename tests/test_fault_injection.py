"""Batch task-retry fault injection (tools/faultinject.py).

The streaming half of fault tolerance is covered by the checkpoint
restart tests in test_streaming.py; these tests cover the batch half:
a real Spark task retry (master ``local[4,2]`` → spark.task.maxFailures
= 2) with a first-attempt failure injected into hot-path operator
stages, asserting the retried result is bit-identical to a clean run —
the "deterministic under partial-stage retries" property the operator
docstrings claim.

Runs in a subprocess because the retrying master string is static conf:
it must be set when the JVM's SparkContext starts, and the suite's
shared session is plain local[8].
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def _run(*extra: str, timeout: int = 600) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", "tools.faultinject", "--sf-dir", SF_DIR, *extra],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    # last stdout line is the JSON report
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def test_task_retry_suite_deterministic():
    report = _run()
    assert report["ok"] is True
    scenarios = report["scenarios"]
    # every determinism risk class is present and green
    assert set(scenarios) == {
        "exact_dedup",
        "sequential_codes",
        "lsh_pairs",
        "splits",
        "cms",
        "agg_reduce",
        "parquet_sink",
        "cdc_merge",
        "stream_cdc_merge",
        "stream_cdc_bucketed",
        "stream_cdc_mor",
        "stream_microbatch_hdfs",
        "stream_microbatch_rocksdb",
        "worker_hard_kill",
    }
    for name, s in scenarios.items():
        assert s["fired"], f"{name}: injection never fired — test is vacuous"
        assert s["match"], f"{name}: retried result diverged from clean run"
        assert s["rows"] > 0, f"{name}: empty result proves nothing"


def test_negative_control_injection_is_real():
    """On maxFailures=1 the same injection must abort the job — proof the
    injector fails attempt 0 for real and the suite's green is earned."""
    report = _run("--negative-control")
    assert report["negative_control"] == "failed_as_expected"
    assert report["fired"] is True


def test_local_cluster_multi_jvm_and_executor_loss():
    """Round-9 multi-process ring: the determinism suite crosses REAL
    executor-JVM serialization boundaries, and a SIGKILLed executor
    (lost shuffle files -> FetchFailed -> stage re-execution) recovers
    bit-identical results."""
    report = _run("--mode", "cluster", timeout=900)
    assert report["ok"] is True
    lc = report["local_cluster"]
    assert lc["master"].startswith("local-cluster[2,2")
    # driver + 2 executors registered before any injection
    assert lc["executors_with_driver_before"] >= 3
    # the full single-JVM determinism suite, replayed across JVMs
    for name, s in lc["scenarios"].items():
        assert s["fired"] and s["match"], f"{name}: {s}"
    assert len(lc["scenarios"]) >= 10
    # executor-loss scenarios: kill really happened, stage re-execution
    # really happened (injected per-partition exec count exceeds the
    # clean plan's natural count), results identical
    for name, s in lc["exec_kill"].items():
        assert s["ok"], f"{name}: {s}"
        assert s["killed_jvm_dead"], name
        if name == "exec_kill_commit":
            # commit-window kill: the evidence is the victim's retried
            # write task + a sibling commit already durable at kill time
            assert s["victim_task_retried"], s
            assert s["committed_before_kill"], s
        elif name != "exec_kill_stream":  # stream evidence = match+kill only
            assert s["reexecuted_map_partitions"], name
    # state recovery across an executor loss mid-stream-query
    assert "exec_kill_stream" in lc["exec_kill"]


def test_speculation_race_is_deterministic():
    """spark.speculation launches a CONCURRENT second attempt of the
    stalled task (standalone cluster, two distinct-host workers — the
    scheduler never speculates onto a host that already has an attempt);
    whichever attempt commits, the bytes match a clean run."""
    report = _run("--mode", "speculation", timeout=900)
    assert report["ok"] is True
    for name, s in report["speculation"]["scenarios"].items():
        assert s["speculated"], f"{name}: no speculative attempt launched"
        assert s["match"], f"{name}: speculation changed the result"
        assert 1 in s["slow_partition_attempts"], name
