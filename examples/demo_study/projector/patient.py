"""Custom Patient projector — what a study's user-authored whistle
projector library does in the reference (``projector_lib``/``whistle_src``,
wstlr/config.py:134-151), re-expressed as a Python builder.

A real study's ``patient.wstl`` maps each participant row to a Patient:
study meta tag, Key_Identifier, gender from the harmonized sex code,
race/ethnicity US-core extensions.  Here the same mapping is a single
declarative select over the extracted (already harmonized) participant
frame — lazy, map-side, no shuffle, so it scales like every built-in
projector.

Demonstrates the explicit ``register(registry)`` hook; sibling files can
instead rely on ``build_*`` autodiscovery (see specimen.py).
"""

from pyspark.sql import functions as F

from ncpi_whistler_spark.functions.harmonize import (
    ethnicity_extension,
    harmonize_as_code,
    key_identifier,
    race_extension,
    study_meta,
)
from ncpi_whistler_spark.operators.harmonize import harmonize


def patients(spark, dataset, study):
    """One Patient per participant row (typed frame — the engine
    serializes it through resources_to_json, dropping nil fields the way
    whistle does)."""
    df = dataset.tables["participant"]
    cm = dataset.concept_map
    # $HarmonizeCode analogs: codings arrays for sex and race local codes
    df = harmonize(df, "sex", "sex", cm, output_col="_sex_codings")
    df = harmonize(df, "race", "race", cm, output_col="_race_codings")
    missing = tuple(study.missing_values)
    return df.select(
        F.lit("custom").alias("module"),
        F.lit("Patient").alias("resourceType"),
        F.struct(F.array(study_meta(study.study_id)).alias("tag")).alias("meta"),
        F.array(
            key_identifier("participant_id", study.identifier_prefix, "Patient")
        ).alias("identifier"),
        harmonize_as_code("_sex_codings").alias("gender"),
        F.filter(
            F.array(
                race_extension("_race_codings", "race", missing),
                ethnicity_extension(
                    # ethnicity has no harmony mapping in the demo study —
                    # text-only extension, the reference's fallback shape
                    F.array().cast(
                        "array<struct<code:string,display:string,system:string>>"
                    ),
                    "ethnicity",
                    missing,
                ),
            ),
            lambda x: x.isNotNull(),
        ).alias("extension"),
    )


def register(registry):
    registry.add("patients", patients)
