"""User-authored projector plugin point (whistle_src/projector_lib analog,
wstlr/config.py:134-151 + wstlr/play.py:46-76): loading, the resources/
play merge, error surfaces, and a differential test against a
hand-written reference-style Patient projector."""

from __future__ import annotations

import json
import os
import textwrap

import pytest

from ncpi_whistler_spark import cli
from ncpi_whistler_spark.plans.config import StudyConfig
from ncpi_whistler_spark.plans.pipeline import extract_dataset
from ncpi_whistler_spark.plans.projectors import (
    ProjectorRegistry,
    load_projector_lib,
    run_projectors,
)
from tests.test_pipeline import study_dir  # fixture reuse  # noqa: F401

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def demo_cfg(monkeypatch):
    monkeypatch.chdir(REPO_ROOT)
    return StudyConfig.from_yaml("examples/demo_study/study.yaml")


def test_registry_loads_both_discovery_styles(demo_cfg):
    """patient.py registers via the explicit register() hook; specimen.py
    relies on build_* autodiscovery — both appear, sorted-by-file order
    (the reference loads the whole projector dir, wstlr/play.py:56-60)."""
    reg = load_projector_lib(demo_cfg)
    assert reg.names() == ["patients", "build_specimens"]


def test_custom_frames_merge_into_resources(spark, demo_cfg):
    ds = extract_dataset(spark, demo_cfg)
    frames = run_projectors(spark, load_projector_lib(demo_cfg), ds, demo_cfg)
    rows = [r for f in frames for r in f.collect()]
    by_type: dict[str, list] = {}
    for r in rows:
        assert r["module"] == "custom"
        by_type.setdefault(r["resourceType"], []).append(json.loads(r["resource_json"]))
    pats = {p["identifier"][0]["value"]: p for p in by_type["Patient"]}
    assert pats["P0001"]["gender"] == "male"
    assert pats["P0002"]["gender"] == "female"
    race = [e for e in pats["P0001"].get("extension", []) if "race" in e["url"]]
    assert race and race[0]["ombCategory"]["code"] == "2106-3"
    specs = {s["identifier"][0]["value"]: s for s in by_type["Specimen"]}
    assert specs["S1"]["subject"]["identifier"]["value"] == "P0001"
    files = [e["valueString"] for e in specs["S1"]["extension"]]
    assert sorted(files) == ["f1.bam", "f2.vcf"]
    assert "extension" not in specs["S2"] or specs["S2"]["extension"] == []


def test_differential_vs_handwritten_reference_projector(spark, demo_cfg):
    """Reproduce a reference-style user projector by hand — the Patient
    mapping a study's patient.wstl emits (Key_Identifier + Study_Meta +
    HarmonizeAsCode gender + Race extension, nils elided, whistle-style)
    — and require the engine's custom-builder output to match it
    key-for-key per participant."""
    import csv as _csv

    # hand-built harmony lookup, the way whistle's $HarmonizeCode sees it
    with open("examples/demo_study/harmony.csv") as fh:
        mappings = list(_csv.DictReader(fh))

    def mapped_first(local_code, local_system):
        for m in mappings:
            if m["local code"] == str(local_code) and m["local code system"] == local_system:
                return {
                    "code": m["code"],
                    "display": m["display"],
                    "system": m["code system"],
                }
        return None

    with open("examples/demo_study/participant.csv") as fh:
        participants = list(_csv.DictReader(fh))

    expected = {}
    for row in participants:
        pid = row["Participant ID"]
        pat = {
            "resourceType": "Patient",
            "meta": {
                "tag": [
                    {
                        "system": "https://ncpi-fhir.github.io/fhir-study-metadata",
                        "code": "DEMOSTUDY",
                    }
                ]
            },
            "identifier": [
                {
                    "value": pid,
                    "system": "https://example.org/demostudy/patient",
                }
            ],
        }
        sex = mapped_first(row["Sex"], "sex")
        if sex:
            pat["gender"] = sex["code"]
        ext = []
        race_raw = row["Race"]
        if race_raw not in ("NA", "", "Not Provided"):
            race = {
                "url": "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race",
                "text": race_raw,
            }
            m = mapped_first(race_raw, "race")
            if m:
                race["ombCategory"] = m
            # whistle field order: url, ombCategory, text (struct order)
            race = {
                k: race[k] for k in ("url", "ombCategory", "text") if k in race
            }
            ext.append(race)
        eth_raw = row["Ethnicity"]
        if eth_raw not in ("NA", "", "Not Provided"):
            ext.append(
                {
                    "url": "http://hl7.org/fhir/us/core/StructureDefinition/us-core-ethnicity",
                    "text": eth_raw,
                }
            )
        pat["extension"] = ext
        expected[pid] = pat

    ds = extract_dataset(spark, demo_cfg)
    frames = run_projectors(spark, load_projector_lib(demo_cfg), ds, demo_cfg)
    actual = {}
    for f in frames:
        for r in f.collect():
            if r["resourceType"] == "Patient":
                doc = json.loads(r["resource_json"])
                actual[doc["identifier"][0]["value"]] = doc
    assert set(actual) == set(expected)
    for pid in expected:
        assert actual[pid] == expected[pid], pid


def test_play_end_to_end_with_custom_projectors(spark, tmp_path, capsys, monkeypatch):
    """play on a study configured with whistle_src: extract → custom
    resource merged under its module → bundles include it → dry-run load
    counts it; editing the projector file re-triggers the build (the
    reference's check_latest_update covers whistle sources,
    wstlr/play.py:119-150)."""
    import time

    d = tmp_path / "study"
    d.mkdir()
    (d / "people.csv").write_text("person id,label\nA1,alpha\nA2,beta\n")
    proj = d / "flags.py"
    proj.write_text(
        textwrap.dedent(
            """
            from pyspark.sql import functions as F

            from ncpi_whistler_spark.functions.harmonize import (
                key_identifier,
                study_meta,
            )

            def build_flags(spark, dataset, study):
                df = dataset.tables["people"]
                return df.select(
                    F.lit("custom").alias("module"),
                    F.lit("Flag").alias("resourceType"),
                    F.struct(F.array(study_meta(study.study_id)).alias("tag")).alias("meta"),
                    F.array(
                        key_identifier("person_id", study.identifier_prefix, "Flag")
                    ).alias("identifier"),
                    F.struct(F.col("person_id").alias("value")).alias("code"),
                )
            """
        )
    )
    (d / "study.yaml").write_text(
        f"""
study_id: PLUGSTUDY
identifier_prefix: https://example.org/plug
id_colname: person_id
whistle_src: {proj}
dataset:
  people:
    filename: {d}/people.csv
"""
    )
    work = str(tmp_path / "work")
    rc = cli.main(["play", str(d / "study.yaml"), "--workdir", work])
    out = capsys.readouterr().out
    assert rc == 0
    assert "custom projectors: build_flags" in out
    res = spark.read.parquet(os.path.join(work, "resources"))
    custom = res.where("module = 'custom'").collect()
    assert {json.loads(r["resource_json"])["code"]["value"] for r in custom} == {
        "A1",
        "A2",
    }
    # bundles carry the custom resources too (Spark JSON part-files,
    # partitioned by load_order/module)
    bundled = spark.read.json(os.path.join(work, "bundles"))
    assert bundled.where("resourceType = 'Flag'").count() == 2

    # unchanged inputs skip; touching the projector file rebuilds
    rc = cli.main(["play", str(d / "study.yaml"), "--workdir", work])
    assert rc == 0 and "skipped" in capsys.readouterr().out
    time.sleep(0.01)
    os.utime(str(proj))
    rc = cli.main(["play", str(d / "study.yaml"), "--workdir", work])
    assert rc == 0 and "rebuilt" in capsys.readouterr().out

    # deleted output dir with a surviving manifest must rebuild, not skip
    # (ADVICE r4: stale-manifest crash) — remove resources/, keep manifest
    import shutil

    shutil.rmtree(os.path.join(work, "resources"))
    rc = cli.main(["play", str(d / "study.yaml"), "--workdir", work])
    assert rc == 0 and "rebuilt" in capsys.readouterr().out
    assert os.path.isdir(os.path.join(work, "resources"))


def test_init_scaffolds_custom_projector(spark, tmp_path):
    """init → resources: the scaffolded projector/patient.py runs through
    the pipeline and emits custom-module Patients with harmonized gender
    (reference init-play discoverability of the extension point)."""
    dest = str(tmp_path / "scaffolded")
    assert cli.main(["init", dest, "--study-id", "SCAF"]) == 0
    assert os.path.exists(os.path.join(dest, "projector", "patient.py"))
    out = str(tmp_path / "res")
    rc = cli.main(["resources", os.path.join(dest, "study.yaml"), "--out", out])
    assert rc == 0
    res = spark.read.parquet(out)
    pats = [
        json.loads(r["resource_json"])
        for r in res.where("module = 'custom'").collect()
    ]
    genders = {p["identifier"][0]["value"]: p.get("gender") for p in pats}
    assert genders == {"P0001": "male", "P0002": "female"}


def test_projector_error_surfaces(spark, tmp_path, demo_cfg):
    # configured-but-missing paths die loudly (reference die_if analog)
    cfg = StudyConfig.from_dict(
        {"study_id": "X", "projector_lib": str(tmp_path / "nope"), "dataset": {}}
    )
    with pytest.raises(FileNotFoundError):
        load_projector_lib(cfg)
    cfg2 = StudyConfig.from_dict(
        {"study_id": "X", "whistle_src": str(tmp_path / "nope.py"), "dataset": {}}
    )
    with pytest.raises(FileNotFoundError):
        load_projector_lib(cfg2)

    # duplicate registration is rejected
    reg = ProjectorRegistry()
    reg.add("a", lambda *a: None)
    with pytest.raises(ValueError, match="duplicate"):
        reg.add("a", lambda *a: None)

    # builder returning a non-frame / malformed frame is a typed error
    ds = extract_dataset(spark, demo_cfg)
    bad = ProjectorRegistry()
    bad.add("oops", lambda s, d, st: 42)
    with pytest.raises(TypeError, match="oops"):
        run_projectors(spark, bad, ds, demo_cfg)
    bad2 = ProjectorRegistry()
    bad2.add("cols", lambda s, d, st: d.tables["participant"])
    with pytest.raises(ValueError, match="module/resourceType"):
        run_projectors(spark, bad2, ds, demo_cfg)

    # None return = conditional projector, silently skipped
    none_reg = ProjectorRegistry()
    none_reg.add("skip_me", lambda s, d, st: None)
    assert run_projectors(spark, none_reg, ds, demo_cfg) == []


def test_serialized_frame_passthrough(spark, demo_cfg):
    """A builder may emit pre-serialized (module, resourceType,
    resource_json) rows — e.g. replaying stored whistle output — and the
    engine passes them through byte-identical."""
    ds = extract_dataset(spark, demo_cfg)
    payload = json.dumps({"resourceType": "Basic", "id": "b1"})
    reg = ProjectorRegistry()
    reg.add(
        "raw",
        lambda s, d, st: s.createDataFrame(
            [("custom", "Basic", payload)], "module string, resourceType string, resource_json string"
        ),
    )
    (frame,) = run_projectors(spark, reg, ds, demo_cfg)
    assert frame.collect()[0]["resource_json"] == payload
