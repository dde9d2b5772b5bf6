"""Differential tests: run the REFERENCE implementation (read-only import
from /root/reference, with its unavailable deps stubbed) against this
engine's operators on identical inputs. This is behavior-parity evidence
stronger than any re-derived unit expectation.

Skipped automatically when the reference checkout isn't present.
"""

from __future__ import annotations

import sys
import types

import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def wstlr():
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # stub the reference's external deps (FHIR client, rich console)
    for name, attrs in [("ncpi_fhir_client", ["fhir_auth"]), ("rich", ["print"])]:
        try:
            __import__(name)
            continue
        except ImportError:
            pass
        m = types.ModuleType(name)
        for a in attrs:
            setattr(m, a, print if a == "print" else types.SimpleNamespace())
        sys.modules[name] = m
    import wstlr

    return wstlr


def test_fix_fieldname_differential(wstlr):
    from ncpi_whistler_spark.functions.core import fix_fieldname

    cases = [
        "Participant ID", "Age (years)", "Weight/Height Note", "  PADDED  ",
        "already_ok", "A/B (C) D", "", "MiXeD CaSe", "tabs\tstay", "a  b",
        "(((", "///", "trailing ", " leading",
    ]
    for c in cases:
        assert fix_fieldname(c) == wstlr.fix_fieldname(c), c


def test_clean_values_differential(wstlr):
    from ncpi_whistler_spark.functions.core import clean_values

    for c in ["a;  b;c", "  x ; y  ", "", "a;b", ";;", "a;\n b", None]:
        assert clean_values(c) == wstlr.clean_values(c), repr(c)


def test_evaluate_bool_differential(wstlr):
    from ncpi_whistler_spark.functions.core import evaluate_bool

    for v in ["TRUE", "yes", "1", 1, True, "no", "0", 0, None, "True ", 2, "on"]:
        assert evaluate_bool(v) == wstlr.evaluate_bool(v), repr(v)


def test_dd_system_url_differential(wstlr):
    from ncpi_whistler_spark.functions.core import dd_system_url

    combos = [
        ("http://x", "CodeSystem", None, "My Table", "My Var"),
        ("http://x", "ValueSet", "Group A", "t", None),
        ("http://x", "CodeSystem", "", "T/T", "v(1)"),
    ]
    for c in combos:
        assert dd_system_url(*c) == wstlr.dd_system_url(*c), c


def test_groupby_differential(wstlr, spark):
    """Reference GroupBy.parse/collect vs group_to_nested on the same
    rows: same keys, same per-group content, same input-order content."""
    from wstlr.extractor import GroupBy

    from ncpi_whistler_spark.operators.nest import group_to_nested

    rows = [
        {"sample_id": "S1", "barcode": "b1", "vol": "1"},
        {"sample_id": "S2", "barcode": "b2", "vol": "2"},
        {"sample_id": "S1", "barcode": "b3", "vol": "3"},
        {"sample_id": "S1", "barcode": "b4", "vol": ""},
    ]
    ref = GroupBy(config="Sample ID")
    for r in rows:
        ref.parse(dict(r))
    ref_out = {
        g["sample_id"]: [c["barcode"] for c in g["content"]] for g in ref.collect()
    }

    df = spark.createDataFrame(
        [(r["sample_id"], r["barcode"], r["vol"], i) for i, r in enumerate(rows)],
        "sample_id string, barcode string, vol string, _rid long",
    )
    mine = group_to_nested(df, "Sample ID", order_by="_rid")
    mine_out = {
        r["sample_id"]: [c["barcode"] for c in r["content"]] for r in mine.collect()
    }
    assert mine_out == ref_out


def test_embed_differential(wstlr, spark, tmp_path):
    """Reference EmbedableTable build/probe vs the embed operator on the
    same CSV: same children per parent (incl. table_name tag and empty
    list on miss)."""
    from wstlr.embedable import EmbedableTable

    from ncpi_whistler_spark.operators.nest import embed
    from ncpi_whistler_spark.sources.csv_source import scan_csv

    child_csv = tmp_path / "manifest.csv"
    child_csv.write_text(
        "Sample ID,File Name\nS1,f1.bam\nS1,f2.vcf\nS3,f3.bam\n"
    )
    ref = EmbedableTable("file_manifest", "specimen", "Sample ID")
    ref.load_data(str(child_csv))
    parents = [{"sample_id": "S1"}, {"sample_id": "S2"}, {"sample_id": "S3"}]
    ref_rows = []
    for p in parents:
        row = dict(p)
        row["file_manifest"] = ref.get_rows(row["sample_id"])
        ref_rows.append(row)
    ref_out = {
        r["sample_id"]: sorted(c["file_name"] for c in r["file_manifest"])
        for r in ref_rows
    }
    ref_tags = {
        c["table_name"] for r in ref_rows for c in r["file_manifest"]
    }

    parent_df = spark.createDataFrame([(p["sample_id"],) for p in parents], "sample_id string")
    child_df = scan_csv(spark, str(child_csv))
    mine = embed(parent_df, child_df, "sample_id", "file_manifest")
    mine_out = {
        r["sample_id"]: sorted(c["file_name"] for c in r["file_manifest"])
        for r in mine.collect()
    }
    mine_tags = {
        c["table_name"] for r in mine.collect() for c in r["file_manifest"]
    }
    assert mine_out == ref_out
    assert mine_tags == ref_tags == {"file_manifest"}


def test_conceptmap_differential(wstlr, spark, tmp_path):
    """Reference BuildConceptMap vs this engine's ConceptMap: identical
    mapping-edge sets (source, local_code, target_system, target_code)
    including the implicit self group and curie prefixing. Shapes differ
    by design (the reference preserves file order; the engine sorts), so
    the comparison is on canonical edges."""
    import json

    from wstlr.conceptmap import BuildConceptMap

    from ncpi_whistler_spark.functions.harmonize import SELF_SYSTEM
    from ncpi_whistler_spark.sources.harmony import ConceptMap

    harmony = tmp_path / "harmony.csv"
    harmony.write_text(
        "local code,text,local code system,code,display,code system\n"
        "1,Male,sex,male,Male,http://hl7.org/fhir/administrative-gender\n"
        "2,Female,sex,female,Female,http://hl7.org/fhir/administrative-gender\n"
        "1,Male,sex,M,MaleV2,http://terminology.hl7.org/v2\n"
        "seiz,Seizure,dx,0001250,Seizure,http://purl.obolibrary.org/obo/hp.owl\n"
        "1,Male,sex,male,Male,http://hl7.org/fhir/administrative-gender\n"  # dup row
    )
    curies = {"http://purl.obolibrary.org/obo/hp.owl": "HP"}
    out = tmp_path / "harmony.json"
    BuildConceptMap([str(harmony)], curies, name_prefix="t", outname=str(out))
    ref = json.loads(out.read_text())
    ref_edges = set()
    for grp in ref["group"]:
        for el in grp["element"]:
            for tgt in el["target"]:
                ref_edges.add((grp["source"], el["code"], grp["target"], tgt["code"]))

    cm = ConceptMap.from_csv(spark, str(harmony), curies=curies)
    mine_edges = set()
    for r in cm.codings_df().collect():
        for c in r["codings"]:
            if c["system"] == SELF_SYSTEM:
                mine_edges.add((r["local_system"], r["local_code"], "self", c["code"]))
            else:
                mine_edges.add((r["local_system"], r["local_code"], c["system"], c["code"]))
    assert mine_edges == ref_edges


def test_ddvariable_differential(wstlr):
    """Reference DdVariable enum parsing / field naming / type mapping vs
    this engine's parse_enumerations + fix_fieldname + standardize maps."""
    from wstlr.dd.variable import DdVariable

    from ncpi_whistler_spark.functions.core import (
        fix_fieldname,
        parse_enumerations,
    )

    def mk(**kw):
        kw.setdefault("data_type", "string")
        kw.setdefault("description", "")
        return DdVariable("study", "tbl", **kw)

    enum_cases = [
        "1=Male;2=Female",
        "A\nB\nA",
        "x=first;x=second",
        "a;  b ;c=See",
        "a=1;b\nc",        # ';' wins over newline
        "single_bare",      # no separator → not an enumeration
        "yes;no",
        "",
    ]
    for enums in enum_cases:
        ref = mk(variable_name="V", enumerations=enums)
        assert parse_enumerations(enums) == ref.enumerations, repr(enums)

    ref = mk(variable_name="Age (years)")
    assert fix_fieldname("Age (years)") == ref.fieldname


def test_objectify_csv_differential(wstlr, spark, tmp_path):
    """Full ObjectifyCSV parity: the survey fixture (aggregators +
    splitter + code_details displays) through the reference extractor vs
    this engine's scan→aggregate→display plan, compared row-for-row
    (engine NULLs ≡ reference absent keys)."""
    from wstlr.extractor import BuildAggregators, GroupBy, ObjectifyCSV

    from ncpi_whistler_spark.operators.aggregators import aggregate_columns
    from ncpi_whistler_spark.operators.harmonize import add_display_columns
    from ncpi_whistler_spark.sources.csv_source import scan_csv

    csv_path = tmp_path / "survey.csv"
    csv_path.write_text(
        "Subject ID,Visit,med_aspirin,med_statin,sym_fever\n"
        "P1,V1,81,NA,yes\n"
        "P2,V2,,325,no\n"
    )
    code_details = {"81": "81 milligrams", "yes": "Fever present", "V1": "Visit one"}
    aggs = {"medications": "^med_", "symptoms": "^sym_"}

    with open(csv_path) as fh:
        ref_rows = ObjectifyCSV(
            fh,
            aggregators=BuildAggregators(aggs),
            grouper=GroupBy(None),
            agg_splitter="_",
            code_details=code_details,
        )

    df = scan_csv(spark, str(csv_path))
    df = aggregate_columns(df, aggs, splitter="_", code_details=code_details)
    df = add_display_columns(df, ["subject_id", "visit"], code_details)
    def canon(rows):
        # the REFERENCE's aggregated-entry order is nondeterministic (it
        # iterates a defaultdict(set), wstlr/extractor.py:148-158); this
        # engine emits column order. Compare arrays order-insensitively.
        out = []
        for r in sorted(rows, key=lambda r: r["subject_id"]):
            row = {}
            for k, v in r.items():
                if isinstance(v, list):
                    row[k] = sorted(
                        (
                            {kk: vv for kk, vv in item.items() if vv is not None}
                            for item in v
                        ),
                        key=lambda d: d.get("code", ""),
                    )
                elif v is not None:
                    row[k] = v
            out.append(row)
        return out

    mine_rows = canon(r.asDict(recursive=True) for r in df.collect())
    assert mine_rows == canon(ref_rows)


def test_module_summary_differential(wstlr, spark):
    """Reference ModuleSummary counts + per-type percentages vs the
    DataFrame module_summary on the same resources."""
    from wstlr.module_summary import ModuleSummary

    from ncpi_whistler_spark.operators.inspector import module_summary
    from ncpi_whistler_spark.sources.json_source import parse_bundle_dict

    bundle = {
        "patient": [{"resourceType": "Patient"}] * 3
        + [{"resourceType": "Observation"}],
        "source_data": [{"resourceType": "Observation"}] * 4,
    }
    ref = ModuleSummary()
    for module, resources in bundle.items():
        for r in resources:
            ref.summary(module, r)
    ref_out = {
        (m, rt): (
            ref.module_summary[m][rt],
            round(100.0 * ref.module_summary[m][rt] / ref.resource_summary[rt], 2),
        )
        for m in ref.module_summary
        for rt in ref.module_summary[m]
    }

    res = parse_bundle_dict(spark, bundle)
    mine = {
        (r["module"], r["resourceType"]): (r["n"], r["pct"])
        for r in module_summary(res).collect()
    }
    assert mine == ref_out


def test_aggregator_classification_differential(wstlr):
    import re

    from wstlr.extractor import AggregateColumns

    from ncpi_whistler_spark.operators.aggregators import classify_columns

    cols = ["subject_id", "med_aspirin", "med_statin", "sym_fever", "visit"]
    ref_std, ref_agg = AggregateColumns(
        {re.compile("^med_", re.I): "medications", re.compile("^sym_", re.I): "symptoms"},
        cols,
    )
    std, agg = classify_columns(cols, {"medications": "^med_", "symptoms": "^sym_"})
    assert set(std) == set(ref_std)
    assert {k: set(v) for k, v in agg.items()} == {
        k: set(v) for k, v in ref_agg.items()
    }


# --------------------------------------------------------------------------
# S8 end-to-end: the WHOLE whistle-input document, reference vs engine
# --------------------------------------------------------------------------

_FULLDOC_PARTICIPANT = """Participant ID,Sex,Race,Age (years)
P0001,1,White,34
P0002,2,Black or African American,41
P0003,1,NA,NA
"""

_FULLDOC_DD = """variable_name,description,data_type,enumerations,min,max,units
Participant ID,Unique participant identifier,identifier,,,,
Sex,Sex assigned at birth,enumeration,1=Male;2=Female,,,
Race,Self-reported race,enumeration,,,,
Age (years),Age at enrollment,integer,,0,120,years
"""

_FULLDOC_SPECIMEN = """sample_id,participant_id,sample_type
S1,P0001,blood
S2,P0001,saliva
S3,P0002,blood
"""

_FULLDOC_MANIFEST = """sample_id,file_name,file_type
S1,f1.bam,bam
S1,f2.vcf,vcf
S3,f3.bam,bam
"""

_FULLDOC_ALIQUOT = """Sample ID,Barcode,participantid,vial_volume
SAMPLE001,001234,P0001,0
SAMPLE001,0124012,P0001,1
SAMPLE002,002001,P0002,2
"""

_FULLDOC_SURVEY = """Subject ID,Visit,med_aspirin,med_statin,sym_fever
P0001,V1,81,NA,yes
P0002,V2,,325,no
"""

_FULLDOC_HARMONY = """local code,text,local code system,code,display,code system,table_name,parent_varname,comment
1,Male,sex,male,Male,http://hl7.org/fhir/administrative-gender,participant,sex,
2,Female,sex,female,Female,http://hl7.org/fhir/administrative-gender,participant,sex,
White,White,race,2106-3,White,urn:oid:2.16.840.1.113883.6.238,participant,race,
"""


def _fulldoc_study(tmp_path):
    d = tmp_path / "fullstudy"
    d.mkdir()
    (d / "participant.csv").write_text(_FULLDOC_PARTICIPANT)
    (d / "participant-dd.csv").write_text(_FULLDOC_DD)
    (d / "specimen.csv").write_text(_FULLDOC_SPECIMEN)
    (d / "file_manifest.csv").write_text(_FULLDOC_MANIFEST)
    (d / "aliquot.csv").write_text(_FULLDOC_ALIQUOT)
    (d / "survey.csv").write_text(_FULLDOC_SURVEY)
    (d / "harmony.csv").write_text(_FULLDOC_HARMONY)
    (d / "study.yaml").write_text(
        f"""
study_id: FULLDOC
study_title: Full Document Study
identifier_prefix: https://example.org/fulldoc
id_colname: participant_id
curies: {{}}
active_tables:
  ALL: true
dataset:
  participant:
    filename: {d}/participant.csv
    code_harmonization: {d}/harmony.csv
    data_dictionary:
      filename: {d}/participant-dd.csv
  specimen:
    filename: {d}/specimen.csv
  file_manifest:
    filename: {d}/file_manifest.csv
    embed:
      dataset: specimen
      colname: sample_id
  aliquot:
    filename: {d}/aliquot.csv
    subject_id: participantid
    group_by: Sample ID
    key_columns: Barcode
  survey:
    filename: {d}/survey.csv
    aggregator-splitter: _
    aggregators:
      medications: ^med_
      symptoms: ^sym_
"""
    )
    return d


def _canon_doc(v):
    """Order- and representation-insensitive canonical form: drop
    None/'' values (engine NULLs ≡ reference absent/empty), stringify
    scalars (engine DD-typed ints ≡ reference csv strings), sort every
    list of objects by its canonical dump."""
    import json

    if isinstance(v, dict):
        out = {}
        for k, val in v.items():
            c = _canon_doc(val)
            if c is None or c == "":
                continue
            out[k] = c
        return out
    if isinstance(v, list):
        return sorted(
            (_canon_doc(x) for x in v), key=lambda x: json.dumps(x, sort_keys=True)
        )
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    if isinstance(v, (int, float)):
        return str(v)
    return v


def test_whistle_input_full_document_differential(wstlr, spark, tmp_path):
    """S8 end-to-end: the reference's DataCsvToObject
    (wstlr/extractor.py:207-375) vs the engine's
    extract_dataset→to_whistle_input on a study exercising embeds +
    groupers + aggregators + harmony + DD — the two whistle-input JSON
    documents must be key-for-key identical (canonicalized for ordering
    and the engine's typed columns)."""
    from wstlr.config import Configuration
    from wstlr.extractor import DataCsvToObject

    from ncpi_whistler_spark.plans.config import StudyConfig
    from ncpi_whistler_spark.plans.pipeline import extract_dataset, to_whistle_input

    d = _fulldoc_study(tmp_path)
    with open(d / "study.yaml", encoding="utf-8-sig") as fh:
        ref_doc = DataCsvToObject(Configuration(fh))

    eng_cfg = StudyConfig.from_yaml(str(d / "study.yaml"))
    eng_doc = to_whistle_input(extract_dataset(spark, eng_cfg), max_rows=None)

    ref_c, eng_c = _canon_doc(ref_doc), _canon_doc(eng_doc)
    assert sorted(ref_c) == sorted(eng_c), (sorted(ref_c), sorted(eng_c))
    for key in ref_c:
        assert eng_c[key] == ref_c[key], f"section {key!r} differs"


def test_whistle_input_optional_blocks_differential(wstlr, spark, tmp_path):
    """The optional study blocks — sponsor, remote_data_access,
    consent_group (whose code scopes harmony system urls) — pass through
    the document identically to the reference."""
    from wstlr.config import Configuration
    from wstlr.extractor import DataCsvToObject

    from ncpi_whistler_spark.plans.config import StudyConfig
    from ncpi_whistler_spark.plans.pipeline import extract_dataset, to_whistle_input

    d = _fulldoc_study(tmp_path)
    extra = """study_sponsor: Example Sponsor Org
remote_data_access:
  access_type: dbgap
  access_url: https://example.org/dbgap
consent_group:
  code: GRU
  name: General Research Use
"""
    yml = d / "study.yaml"
    yml.write_text(yml.read_text() + extra)
    with open(yml, encoding="utf-8-sig") as fh:
        ref_doc = DataCsvToObject(Configuration(fh))
    eng_doc = to_whistle_input(
        extract_dataset(spark, StudyConfig.from_yaml(str(yml))), max_rows=None
    )
    ref_c, eng_c = _canon_doc(ref_doc), _canon_doc(eng_doc)
    assert eng_c["study"] == ref_c["study"]
    assert eng_c["harmony"] == ref_c["harmony"]
    assert eng_doc["study"]["sponsor"] == "Example Sponsor Org"
    assert eng_doc["study"]["consent_code"] == "GRU"
    assert "/data-dictionary/gru/" in eng_doc["harmony"][0]["source_codes"][0]["system"]
