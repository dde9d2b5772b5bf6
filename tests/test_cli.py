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


def test_cli_builddd_igload_ledger(spark, study_dir, tmp_path):  # noqa: F811
    import json as _json

    # builddd from the participant fixture CSV
    dd_out = str(tmp_path / "inferred-dd.csv")
    rc = cli.main(["builddd", str(study_dir / "participant.csv"), "--name",
                   "participant", "--out", dd_out])
    assert rc == 0 and os.path.exists(dd_out)

    # igload from a json file
    ig = tmp_path / "cs.json"
    ig.write_text(_json.dumps({"resourceType": "CodeSystem", "url": "http://x"}))
    ig_out = str(tmp_path / "ig_parquet")
    assert cli.main(["igload", str(ig), "--out", ig_out]) == 0
    assert spark.read.parquet(ig_out).count() == 1

    # ledger + purge dry run
    from ncpi_whistler_spark.sinks.ledger import append_ledger

    ledger = str(tmp_path / "ledger")
    ids = spark.createDataFrame(
        [("S1", "dev", "Patient", "p1")],
        "study_id string, host string, resource_type string, fhir_id string",
    )
    append_ledger(spark, ledger, ids)
    assert cli.main(["studyids", ledger]) == 0
    assert cli.main(["purge", ledger, "--study-id", "S1", "--host", "dev"]) == 0


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


def test_demo_study_example(spark, monkeypatch, tmp_path):
    """The shipped examples/demo_study config extracts end-to-end (paths
    are repo-root relative, like the README commands)."""
    import os

    from ncpi_whistler_spark.plans.config import StudyConfig
    from ncpi_whistler_spark.plans.pipeline import extract_dataset

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.chdir(root)
    cfg = StudyConfig.from_yaml("examples/demo_study/study.yaml")
    ds = extract_dataset(spark, cfg)
    assert set(ds.tables) == {"participant", "specimen"}
    part = {r["participant_id"]: r for r in ds.tables["participant"].collect()}
    assert part["P0001"]["sex_display"] == "Male"
    meds = {m["code"]: m for m in part["P0001"]["medications"]}
    assert meds["aspirin"]["value"] == "81"
    spec = {r["sample_id"]: r for r in ds.tables["specimen"].collect()}
    assert len(spec["S1"]["file_manifest"]) == 2
