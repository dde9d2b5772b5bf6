"""Study-id ledger + dependency-ordered purge (E7/S11/O2).

Reference: ids loaded per (study, host, resourceType) are written to a
JSON ledger, merged not overwritten, for later purge (wstlr/studyids.py:
31-107); purge deletes in a fixed reverse-dependency resourceType order
with retries (wstlr/purge.py:21-193).

Spark design: the ledger is an append-only parquet table deduped on read
(merge = union + dropDuplicates); purge becomes an ordered sequence of
partition-wise delete passes through the same injectable transport the
REST sink uses.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = (
    "study_id string, host string, resource_type string, fhir_id string"
)

#: load-dependency order (reference constant, wstlr/purge.py:21-40);
#: purge walks it in reverse.
RESOURCE_ORDER = [
    "ResearchStudy",
    "Patient",
    "ResearchSubject",
    "Specimen",
    "Condition",
    "Observation",
    "DocumentReference",
    "QuestionnaireResponse",
    "Questionnaire",
    "ObservationDefinition",
    "ActivityDefinition",
    "ConceptMap",
    "ValueSet",
    "CodeSystem",
]


def append_ledger(spark: SparkSession, ledger_path: str, ids: DataFrame) -> None:
    """Merge-not-overwrite append (wstlr/studyids.py:31-107): plain
    append; read-side dedup keeps the table an idempotent set."""
    ids.select("study_id", "host", "resource_type", "fhir_id").write.mode(
        "append"
    ).parquet(ledger_path)


def read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    try:
        df = spark.read.parquet(ledger_path)
    except Exception:
        return spark.createDataFrame([], LEDGER_SCHEMA)
    return df.dropDuplicates(["study_id", "host", "resource_type", "fhir_id"])


def purge_order(types_present: list[str]) -> list[str]:
    """Reverse dependency order, unknown types last (O2)."""
    known = [t for t in reversed(RESOURCE_ORDER) if t in types_present]
    unknown = sorted(t for t in types_present if t not in RESOURCE_ORDER)
    return known + unknown


def purge_study(
    spark: SparkSession,
    ledger_path: str,
    study_id: str,
    host: str,
    delete_fn: Callable[[str, str], bool],
    parallelism: int = 10,
) -> dict[str, int]:
    """Delete every ledgered id for (study, host), one resourceType at a
    time in dependency order; returns per-type deleted counts. The
    delete transport is injected (tests use a recording fake)."""
    ledger = read_ledger(spark, ledger_path).where(
        (F.col("study_id") == study_id) & (F.col("host") == host)
    )
    types = [r["resource_type"] for r in ledger.select("resource_type").distinct().collect()]
    results: dict[str, int] = {}
    for rt in purge_order(types):
        ids = ledger.where(F.col("resource_type") == rt).select("fhir_id")
        deleted = (
            ids.repartition(parallelism)
            .rdd.map(lambda row: 1 if delete_fn(rt, row["fhir_id"]) else 0)
            .sum()
        )
        results[rt] = int(deleted)
    return results
