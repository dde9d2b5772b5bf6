"""Operator semantics on whistler-style fixtures (FIXTURES.md schemas)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ncpi_whistler_spark.operators.aggregators import aggregate_columns, classify_columns
from ncpi_whistler_spark.operators.harmonize import add_display_columns, harmonize
from ncpi_whistler_spark.operators.nest import embed, group_to_nested
from ncpi_whistler_spark.operators.relational import as_of_join
from ncpi_whistler_spark.functions import harmonize as H
from ncpi_whistler_spark.sources.harmony import ConceptMap


@pytest.fixture(scope="module")
def specimen(spark):
    return spark.createDataFrame(
        [
            ("S1", "P1", "blood", "1.0"),
            ("S2", "P1", "saliva", "2.0"),
            ("S3", "P2", "blood", "0.5"),
        ],
        "sample_id string, participant_id string, sample_type string, volume string",
    )


@pytest.fixture(scope="module")
def file_manifest(spark):
    return spark.createDataFrame(
        [
            ("S1", "f1.bam", "bam", "10"),
            ("S1", "f2.vcf", "vcf", "1"),
            ("S3", "f3.bam", "bam", "12"),
        ],
        "sample_id string, file_name string, file_type string, size_mb string",
    )


def test_embed_nests_children(specimen, file_manifest):
    out = embed(specimen, file_manifest, "sample_id", "file_manifest")
    rows = {r["sample_id"]: r for r in out.collect()}
    # N matches (wstlr/embedable.py:46-53): child rows + table_name tag
    s1 = rows["S1"]["file_manifest"]
    assert len(s1) == 2
    assert {c["table_name"] for c in s1} == {"file_manifest"}
    assert sorted(c["file_name"] for c in s1) == ["f1.bam", "f2.vcf"]
    # miss → empty list, not null
    assert rows["S2"]["file_manifest"] == []
    assert len(rows["S3"]["file_manifest"]) == 1


def test_embed_multi_column_key(spark):
    parent = spark.createDataFrame([("a", "x", 1), ("a", "y", 2)], "k1 string, k2 string, v int")
    child = spark.createDataFrame([("a", "x", "c1"), ("a", "x", "c2")], "k1 string, k2 string, c string")
    out = embed(parent, child, "k1,k2", "kids", tag_table_name=False)
    rows = {(r["k1"], r["k2"]): r["kids"] for r in out.collect()}
    assert len(rows[("a", "x")]) == 2
    assert rows[("a", "y")] == []


def test_group_to_nested_preserves_order(spark):
    df = spark.createDataFrame(
        [("g1", "b1", 0), ("g1", "b2", 1), ("g2", "b3", 2), ("g1", "b4", 3)],
        "sample_id string, barcode string, _rid long",
    )
    out = group_to_nested(df, "Sample ID", order_by="_rid")
    rows = {r["sample_id"]: r["content"] for r in out.collect()}
    assert [c["barcode"] for c in rows["g1"]] == ["b1", "b2", "b4"]
    assert "_rid" not in out.schema["content"].dataType.elementType.fieldNames()


def test_aggregate_columns_pivot(spark):
    df = spark.createDataFrame(
        [("p1", "v1", "81", "325", "", "NA")],
        "subject_id string, visit string, med_aspirin string, med_statin string, sym_fever string, sym_cough string",
    )
    out = aggregate_columns(
        df, {"medications": "^med_", "symptoms": "^sym_"}, splitter="_",
        drop_missing=True,
    )
    assert set(out.columns) == {"subject_id", "visit", "medications", "symptoms"}
    row = out.collect()[0]
    assert {(m["code"], m["value"]) for m in row["medications"]} == {
        ("aspirin", "81"),
        ("statin", "325"),
    }
    # missing vocabulary filtered (wstlr/extractor.py:209)
    assert row["symptoms"] == []


def test_classify_first_regex_wins():
    std, matched = classify_columns(
        ["id", "med_a", "med_sym_b"], {"meds": "^med_", "syms": "sym_"}
    )
    assert std == ["id"]
    assert matched["meds"] == ["med_a", "med_sym_b"]
    assert matched["syms"] == []


def test_harmonize_function_family(spark):
    cm = ConceptMap.from_rows(
        spark,
        [
            ("1", "Male", "sex", "male", "Male", "http://hl7.org/fhir/administrative-gender"),
            ("1", "Male", "sex", "M", "Male(v2)", "http://terminology.hl7.org/CodeSystem/v2-0001-unharmonized"),
            ("2", "Female", "sex", "female", "Female", "http://hl7.org/fhir/administrative-gender"),
        ],
    )
    df = spark.createDataFrame([("P1", "1"), ("P2", "2"), ("P3", "NA")], "pid string, sex string")
    h = harmonize(df, "sex", "sex", cm)
    out = h.select(
        "pid",
        F.size("codings").alias("n"),
        H.harmonize_as_code("codings").alias("code"),
        H.harmonized_local_display("codings").alias("text"),
        F.size(H.harmonize_mapped("codings")).alias("n_mapped"),
    ).collect()
    rows = {r["pid"]: r for r in out}
    # self + 2 targets for code 1; -unharmonized excluded from mapped
    assert rows["P1"]["n"] == 3
    assert rows["P1"]["n_mapped"] == 1
    assert rows["P1"]["code"] == "male"
    assert rows["P1"]["text"] == "Male"
    assert rows["P2"]["code"] == "female"
    # unmapped value: empty codings
    assert rows["P3"]["n"] == 0
    assert rows["P3"]["code"] is None


def test_display_columns(spark):
    # reference-exact global value-keyed map
    out = add_display_columns(
        spark.createDataFrame([("P1", "White"), ("P2", "Other")], "pid string, race string"),
        ["race"],
        {"White": "White(display)"},
    )
    rows = {r["pid"]: r for r in out.collect()}
    assert rows["P1"]["race_display"] == "White(display)"
    assert rows["P2"]["race_display"] is None

    # scoped variant: per-column local_system
    from ncpi_whistler_spark.operators.harmonize import add_display_columns_scoped

    cm = ConceptMap.from_rows(
        spark,
        [("White", "White", "race", "2106-3", "White", "urn:oid:2.16.840.1.113883.6.238")],
    )
    df = spark.createDataFrame([("P1", "White"), ("P2", "Other")], "pid string, race string")
    out2 = add_display_columns_scoped(df, ["race"], cm)
    rows2 = {r["pid"]: r for r in out2.collect()}
    assert rows2["P1"]["race_display"] == "White"
    assert rows2["P2"]["race_display"] is None


def test_curie_prefixing(spark):
    cm = ConceptMap.from_rows(
        spark,
        [("seiz", "Seizure", "dx", "0001250", "Seizure", "http://purl.obolibrary.org/obo/hp.owl")],
        curies={"http://purl.obolibrary.org/obo/hp.owl": "HP"},
    )
    row = cm.mappings.collect()[0]
    assert row["code"] == "HP:0001250"


def test_as_of_join(spark):
    trades = spark.createDataFrame(
        [("A", 10, "t1"), ("A", 20, "t2"), ("B", 15, "t3")],
        "sym string, t long, trade string",
    )
    quotes = spark.createDataFrame(
        [("A", 5, 100.0), ("A", 15, 101.0), ("B", 20, 50.0)],
        "sym string, t long, px double",
    )
    out = as_of_join(trades, quotes, ["sym"], "t", "t")
    rows = {r["trade"]: r["px"] for r in out.collect()}
    assert rows["t1"] == 100.0  # quote@5 is latest <= 10
    assert rows["t2"] == 101.0  # quote@15
    assert rows["t3"] is None  # no quote <= 15 for B


def test_approx_distinct_error_bound(spark):
    """HLL++ at rsd=2% must land within 5% of the exact distinct count
    per group on the fixture orders table."""
    import pyspark.sql.functions as F

    from ncpi_whistler_spark.catalog import load_table
    from tests.conftest import SF_DIR

    o = load_table(spark, SF_DIR, "orders")
    approx = {
        r["o_orderpriority"]: r["a"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("a"))
        .collect()
    }
    exact = {
        r["o_orderpriority"]: r["e"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("e"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(1, 0.05 * e), (k, approx[k], e)


def test_hll60_distinct_error_bound(spark):
    """The explicit h60-HLL (p=10, small-range linear counting) lands
    within 5% of exact per group — same bound as the native sketch — and
    its register construction is mergeable (max per bucket)."""
    import pyspark.sql.functions as F

    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.operators.profiling import hll60_distinct
    from tests.conftest import SF_DIR

    o = load_table(spark, SF_DIR, "orders")
    est = {
        r["o_orderpriority"]: r["hll_estimate"]
        for r in hll60_distinct(o, ["o_orderpriority"], "o_custkey").collect()
    }
    exact = {
        r["o_orderpriority"]: r["e"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("e"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, 0.05 * e), (k, est[k], e)
