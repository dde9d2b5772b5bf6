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


def _run(*extra: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", "tools.faultinject", "--sf-dir", SF_DIR, *extra],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
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
        "stream_microbatch_hdfs",
        "stream_microbatch_rocksdb",
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
