"""Column aggregators: wide→long pivot into struct arrays (A2).

Reference semantics (wstlr/extractor.py:100-127,160-187): config maps
``{newvar: regex}``; every column whose (normalized) name matches a regex is
removed from the row and folded into ``newvar: [{code, value, text?}, ...]``.
An optional ``aggregator-splitter`` strips a prefix from the code (split on
the splitter, drop the first token). First-matching-regex wins per column.

Spark design: the regex classification runs at *plan time* over
``df.columns`` (exactly like the reference classifying the header once per
file, wstlr/extractor.py:156-158); the rewrite is a single ``select`` whose
array literals are built from matched column names — no shuffle, no UDF,
stays in whole-stage codegen.
"""

from __future__ import annotations

import re
from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def classify_columns(
    colnames: list[str], aggregators: Mapping[str, str]
) -> tuple[list[str], dict[str, list[str]]]:
    """Plan-time split of columns into (standard, {newvar: [matched]}).
    First matching aggregator wins (wstlr/extractor.py:100-127)."""
    compiled = {name: re.compile(rgx, re.IGNORECASE) for name, rgx in aggregators.items()}
    standard: list[str] = []
    matched: dict[str, list[str]] = {name: [] for name in aggregators}
    for c in colnames:
        for name, rgx in compiled.items():
            if rgx.search(c):
                matched[name].append(c)
                break
        else:
            standard.append(c)
    return standard, matched


def _code_of(colname: str, splitter: str | None) -> str:
    if splitter and splitter in colname:
        return colname.split(splitter, 1)[1]
    return colname


def aggregate_columns(
    df: DataFrame,
    aggregators: Mapping[str, str],
    splitter: str | None = None,
    code_rename: Mapping[str, str] | None = None,
    code_details: Mapping[str, str] | None = None,
    drop_missing: bool = False,
    missing_values: tuple[str, ...] = ("", "NA", "Not Provided"),
) -> DataFrame:
    """Rewrite wide measurement columns into per-group struct arrays.

    ``code_rename`` applies the DD varname lookup to codes (P1 interplay,
    wstlr/extractor.py:168-183). ``code_details`` adds the harmony
    ``text`` member when the ORIGINAL column name appears in the map
    (wstlr/extractor.py:183-187). The reference keeps missing values in
    the arrays (filtering happens later in whistle guards); pass
    ``drop_missing=True`` to filter at the pivot instead.
    """
    standard, matched = classify_columns(df.columns, aggregators)
    selects: list[Column] = [F.col(c) for c in standard]
    for newvar, cols in matched.items():
        entries = []
        for c in cols:
            code = _code_of(c, splitter)
            if code_rename:
                code = code_rename.get(f"{newvar}:{code}", code_rename.get(code, code))
            text = (code_details or {}).get(c)
            entries.append(
                F.struct(
                    F.lit(code).alias("code"),
                    F.col(c).cast("string").alias("value"),
                    F.lit(text).cast("string").alias("text"),
                )
            )
        arr = F.array(*entries) if entries else F.array().cast(
            "array<struct<code:string,value:string,text:string>>"
        )
        if drop_missing and entries:
            arr = F.filter(
                arr, lambda x: x["value"].isNotNull() & ~x["value"].isin(*missing_values)
            )
        selects.append(arr.alias(newvar))
    return df.select(*selects)


def explode_aggregated(
    df: DataFrame, newvar: str, keys: list[str] | None = None
) -> DataFrame:
    """Long-form view of an aggregated column: one row per (row, code).
    The inverse projection the whistle templates perform when iterating
    ``row.<newvar>[]`` (templates/observation_w_components.wstl:110-121)."""
    keys = keys or [c for c in df.columns if c != newvar]
    ex = df.select(*keys, F.explode_outer(newvar).alias("_e"))
    return ex.select(*keys, F.col("_e.code").alias("code"), F.col("_e.value").alias("value"))
