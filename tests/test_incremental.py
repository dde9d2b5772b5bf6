"""Incremental-recompute manifest semantics (mtime/force parity with the
reference's check_latest_update)."""

from __future__ import annotations

import os

from ncpi_whistler_spark.plans.incremental import BuildManifest, run_if_stale


def test_run_if_stale_lifecycle(tmp_path):
    src = tmp_path / "input.csv"
    src.write_text("a,b\n1,2\n")
    manifest = str(tmp_path / "out.manifest.json")
    runs = []

    def build():
        runs.append(1)

    # first build always runs
    assert run_if_stale(manifest, [str(src)], build) is True
    # unchanged inputs → skipped
    assert run_if_stale(manifest, [str(src)], build) is False
    assert len(runs) == 1
    # touch content → re-runs
    src.write_text("a,b\n1,3\n")
    assert run_if_stale(manifest, [str(src)], build) is True
    # force → runs even when current
    assert run_if_stale(manifest, [str(src)], build, force=True) is True
    assert len(runs) == 3


def test_missing_input_is_stale(tmp_path):
    src = tmp_path / "x"
    src.write_text("1")
    m = BuildManifest(str(tmp_path / "m.json"))
    m.record([str(src)])
    assert m.is_current([str(src)])
    os.remove(src)
    assert not m.is_current([str(src)])
