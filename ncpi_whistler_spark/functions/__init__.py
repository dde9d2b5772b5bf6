"""Scalar-function surface of the engine.

``core``      — the reference's Python helpers (fix_fieldname, clean_values,
                evaluate_bool, ...) as plan-time helpers + native Columns.
``harmonize`` — the whistle Harmonize* function family as Column builders
                over a broadcast ConceptMap (wstlr/wlib/core/*.wstl).
"""

from ncpi_whistler_spark.functions.core import (
    clean_values,
    clean_values_col,
    curie_prefix_col,
    dd_system_url,
    evaluate_bool,
    evaluate_bool_col,
    fix_fieldname,
    fix_fieldname_col,
    key_concat,
    normalize_headers,
    parse_enumerations,
    standardize_dd_type,
    try_float_col,
)

__all__ = [
    "fix_fieldname",
    "fix_fieldname_col",
    "clean_values",
    "clean_values_col",
    "evaluate_bool",
    "evaluate_bool_col",
    "standardize_dd_type",
    "dd_system_url",
    "parse_enumerations",
    "key_concat",
    "curie_prefix_col",
    "try_float_col",
    "normalize_headers",
]
