"""Custom Specimen projector — ``build_*`` autodiscovery variant.

One FHIR Specimen per specimen row, subject-referenced to the Patient
the sibling patient.py projector emits.  The embedded file_manifest rows
(nested by the config's embed directive) become Specimen extensions, the
way study projectors surface per-sample file metadata.
"""

from pyspark.sql import functions as F

from ncpi_whistler_spark.functions.harmonize import (
    key_identifier,
    reference_key_identifier,
    study_meta,
)


def build_specimens(spark, dataset, study):
    df = dataset.tables["specimen"]
    return df.select(
        F.lit("custom").alias("module"),
        F.lit("Specimen").alias("resourceType"),
        F.struct(F.array(study_meta(study.study_id)).alias("tag")).alias("meta"),
        F.array(
            key_identifier("sample_id", study.identifier_prefix, "Specimen")
        ).alias("identifier"),
        reference_key_identifier(
            "participant_id", study.identifier_prefix, "Patient"
        ).alias("subject"),
        F.struct(
            F.struct(F.col("sample_type").alias("text")).alias("type")
        ).alias("collection"),
        F.transform(
            "file_manifest",
            lambda f: F.struct(
                F.lit("https://example.org/fhir/StructureDefinition/sample-file").alias(
                    "url"
                ),
                f["file_name"].alias("valueString"),
            ),
        ).alias("extension"),
    )
