"""Property-based tests (hypothesis) for the pure scalar surface — the
testing layer the reference lacks (SURVEY.md §5 implication)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ncpi_whistler_spark.functions.core import (
    clean_values,
    evaluate_bool,
    fix_fieldname,
    parse_enumerations,
)

text = st.text(max_size=80)


@given(text)
@settings(max_examples=200)
def test_fix_fieldname_stabilizes(s):
    """fix_fieldname is reference-exact (wstlr/__init__.py:153-161) and
    the REFERENCE is not idempotent: strip() runs before paren-dropping,
    so '(\\x1f0' → '\\x1f0' → '0' (dropping a paren can expose
    stripped-on-the-next-pass whitespace). The second application is a
    fixpoint: its output has no parens/spaces left to expose anything."""
    twice = fix_fieldname(fix_fieldname(s))
    assert fix_fieldname(twice) == twice


@given(text)
@settings(max_examples=200)
def test_fix_fieldname_no_forbidden_chars(s):
    out = fix_fieldname(s)
    assert "(" not in out and ")" not in out and "/" not in out
    assert " " not in out.strip() or out == out.strip()
    assert out == out.lower()


@given(st.one_of(st.none(), text))
@settings(max_examples=200)
def test_clean_values_total_and_idempotent(s):
    out = clean_values(s)
    assert isinstance(out, str)
    assert clean_values(out) == out


@given(st.one_of(st.none(), st.booleans(), st.integers(), text))
@settings(max_examples=200)
def test_evaluate_bool_total(v):
    assert evaluate_bool(v) in (True, False)


@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.characters(exclude_characters=";=\n"), min_size=1, max_size=10),
            st.text(alphabet=st.characters(exclude_characters=";=\n"), max_size=10),
        ),
        max_size=8,
    )
)
@settings(max_examples=200)
def test_parse_enumerations_roundtrip(pairs):
    enc = ";".join(f"{k}={v}" for k, v in pairs)
    out = parse_enumerations(enc)
    # every parsed key must come from the input, first-dup wins
    seen: dict[str, str] = {}
    for k, v in pairs:
        k2, v2 = k.strip(), v.strip()
        # reference semantics: clean_values collapses '; ' runs, then
        # split on ';' — values with leading spaces after a ';' are merged
        if k2 and k2 not in seen:
            seen[k2] = v2
    for k in out:
        assert k in seen


# --------------------------------------------------------------------------
# Differential fuzzing vs the reference implementation (skips if absent)
# --------------------------------------------------------------------------

import os
import sys

import pytest

_REF = "/root/reference"


def _ref_wstlr():
    if not os.path.isdir(_REF):
        pytest.skip("reference checkout not available")
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import types

    for name in ("ncpi_fhir_client", "rich"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
                if name == "ncpi_fhir_client":
                    sys.modules[name].fhir_auth = types.SimpleNamespace()
                else:
                    sys.modules[name].print = print
    import wstlr

    return wstlr


@given(text)
@settings(max_examples=300, deadline=None)
def test_fix_fieldname_differential_fuzz(s):
    """Engine fix_fieldname == reference fix_fieldname on ARBITRARY
    strings, not just curated cases — the header-normalization function
    keys every join/rename in the pipeline, so any divergence silently
    re-keys columns."""
    from ncpi_whistler_spark.functions.core import fix_fieldname

    wstlr = _ref_wstlr()
    assert fix_fieldname(s) == wstlr.fix_fieldname(s)


@given(st.one_of(st.none(), text))
@settings(max_examples=300, deadline=None)
def test_clean_values_differential_fuzz(s):
    from ncpi_whistler_spark.functions.core import clean_values

    wstlr = _ref_wstlr()
    assert clean_values(s) == wstlr.clean_values(s)


@given(st.one_of(st.none(), st.booleans(), st.integers(min_value=-10, max_value=10), text))
@settings(max_examples=300, deadline=None)
def test_evaluate_bool_differential_fuzz(v):
    from ncpi_whistler_spark.functions.core import evaluate_bool

    wstlr = _ref_wstlr()
    assert evaluate_bool(v) == wstlr.evaluate_bool(v)
