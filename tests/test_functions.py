"""Unit tests for the scalar function surface (reference parity cases from
/root/reference/tests/test_wstlr_init.py semantics, re-written)."""

from __future__ import annotations

import pytest

from ncpi_whistler_spark.functions.core import (
    InvalidType,
    clean_values,
    evaluate_bool,
    fix_fieldname,
    dd_system_url,
    fix_target_system,
    parse_enumerations,
    standardize_dd_type,
)


def test_fix_fieldname():
    assert fix_fieldname("Participant ID") == "participant_id"
    assert fix_fieldname("Age (years)") == "age_years"
    assert fix_fieldname("Weight/Height Note") == "weight_height_note"
    assert fix_fieldname("  PADDED  ") == "padded"
    assert fix_fieldname("already_ok") == "already_ok"


def test_clean_values():
    assert clean_values("a;  b;c") == "a;b;c"
    assert clean_values(None) == ""
    assert clean_values("  x ; y  ") == "x ;y"


def test_standardize_dd_type():
    assert standardize_dd_type("integer") == "int"
    assert standardize_dd_type("Decimal") == "number"
    assert standardize_dd_type("") == "string"
    assert standardize_dd_type("identifier") == "string"
    assert standardize_dd_type("string, encoded value") == "enumeration"
    with pytest.raises(InvalidType):
        standardize_dd_type("quaternion")


def test_evaluate_bool():
    assert evaluate_bool("TRUE") is True
    assert evaluate_bool("yes")
    assert evaluate_bool("1")
    assert evaluate_bool(1)
    assert evaluate_bool(True)
    assert not evaluate_bool("no")
    assert not evaluate_bool(None)
    assert not evaluate_bool(0)


def test_dd_system_url():
    assert (
        dd_system_url("http://x", "CodeSystem", None, "My Table", "My Var")
        == "http://x/CodeSystem/data-dictionary/my_table/my_var"
    )
    assert (
        dd_system_url("http://x", "CodeSystem", "Group A", "t", None)
        == "http://x/CodeSystem/data-dictionary/group_a/t"
    )


def test_parse_enumerations():
    assert parse_enumerations("1=Male;2=Female") == {"1": "Male", "2": "Female"}
    assert parse_enumerations("A\nB\nC") == {"A": "A", "B": "B", "C": "C"}
    # first duplicate wins (wstlr/dd/variable.py:92-116)
    assert parse_enumerations("x=first;x=second") == {"x": "first"}
    assert parse_enumerations("") == {}
    assert parse_enumerations(None) == {}


def test_fix_target_system():
    assert fix_target_system("https://example.org/fhir/CodeSystem") == (
        "example_org_fhir_CodeSystem"
    )
