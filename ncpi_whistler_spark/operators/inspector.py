"""Pre-load sanity inspections (E8; reference wstlr/inspector.py:27-97) and
module summaries (A3; wstlr/module_summary.py:9-41) as DataFrame checks.

Each check returns a DataFrame of violations — empty means pass — so the
whole validation suite composes into one job and scales with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def duplicate_identifiers(resources: DataFrame) -> DataFrame:
    """Identifiers used by more than one resource (the reference's
    duplicate-identifier check, wstlr/inspector.py:27-63)."""
    ident = F.get_json_object("resource_json", "$.identifier[0].value")
    return (
        resources.select(
            "resourceType", ident.alias("identifier")
        )
        .where(F.col("identifier").isNotNull())
        .groupBy("resourceType", "identifier")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def missing_meta_tag(resources: DataFrame) -> DataFrame:
    """Resources without the required study meta.tag
    (wstlr/inspector.py:63-77)."""
    tag = F.get_json_object("resource_json", "$.meta.tag[0].code")
    return resources.where(tag.isNull()).select(
        "module", "resourceType", "resource_json"
    )


def observations_without_code(resources: DataFrame) -> DataFrame:
    """Observation.code required (wstlr/inspector.py:79-97)."""
    code = F.get_json_object("resource_json", "$.code")
    return resources.where(
        (F.col("resourceType") == "Observation") & code.isNull()
    ).select("module", "resource_json")


def module_summary(resources: DataFrame) -> DataFrame:
    """module × resourceType counts with percent of that resourceType's
    total (reference semantics: the %% column is per-type, not global —
    wstlr/module_summary.py:36-41)."""
    from pyspark.sql.window import Window

    counts = resources.groupBy("module", "resourceType").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_type = Window.partitionBy("resourceType")
    return counts.withColumn(
        "pct", F.round(F.col("n") * 100.0 / F.sum("n").over(per_type), 2)
    )


def run_inspections(resources: DataFrame) -> dict[str, int]:
    """Run the suite; returns violation counts keyed by check name (the
    reference prints warnings — callers decide whether to fail)."""
    return {
        "duplicate_identifiers": duplicate_identifiers(resources).count(),
        "missing_meta_tag": missing_meta_tag(resources).count(),
        "observations_without_code": observations_without_code(resources).count(),
    }
