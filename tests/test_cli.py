"""CLI surface: extract end-to-end through main()."""

from __future__ import annotations

import json
import os

from ncpi_whistler_spark import cli
from tests.test_pipeline import study_dir  # fixture reuse  # noqa: F401


def test_cli_extract(spark, study_dir, tmp_path):  # noqa: F811
    json_out = str(tmp_path / "whistle_input.json")
    out_dir = str(tmp_path / "tables")
    rc = cli.main(
        [
            "extract",
            str(study_dir / "study.yaml"),
            "--out",
            out_dir,
            "--json-out",
            json_out,
        ]
    )
    assert rc == 0
    doc = json.loads(open(json_out).read())
    assert doc["study"]["id"] == "TESTSTUDY"
    assert "participant" in doc and len(doc["participant"]) == 3
    assert os.path.isdir(os.path.join(out_dir, "specimen"))
    back = spark.read.parquet(os.path.join(out_dir, "participant"))
    assert back.count() == 3


def test_cli_resources_and_inspect(spark, study_dir, tmp_path):  # noqa: F811
    out = str(tmp_path / "resources")
    rc = cli.main(
        ["resources", str(study_dir / "study.yaml"), "--out", out,
         "--bundles", str(tmp_path / "bundles")]
    )
    assert rc == 0
    res = spark.read.parquet(out)
    assert res.count() > 0
    assert set(res.columns) == {"module", "resourceType", "resource_json"}
    # inspect returns 0 (clean) or 2 (violations) — both valid exits
    rc2 = cli.main(["inspect", out])
    assert rc2 in (0, 2)
