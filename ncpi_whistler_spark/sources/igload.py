"""FHIR IG definition sources (S7/P5; reference wstlr/igload/*).

Loads StructureDefinition/CodeSystem/ValueSet resources from an IG
``definitions.json.zip``, a local file/directory, or a URL, with the
substring-exclusion filter applied at plan time. Network/zip access is
driver-side (definitions are config-scale); resources land in the same
(module, resourceType, resource_json) frame every sink consumes.
"""

from __future__ import annotations

import json
import os
import zipfile

from pyspark.sql import DataFrame, SparkSession

from ncpi_whistler_spark.sources.json_source import RESOURCE_SCHEMA


def _excluded(name: str, exclusions: list[str]) -> bool:
    """Substring-match exclusion (P5, wstlr/igload/__init__.py:21-26)."""
    return any(x in name for x in exclusions)


def _rows_from_named_docs(
    docs: list[tuple[str, dict]], exclusions: list[str]
) -> list[tuple[str, str, str]]:
    rows = []
    for name, doc in docs:
        if _excluded(name, exclusions):
            continue
        rt = doc.get("resourceType", "")
        if rt == "Bundle":
            for entry in doc.get("entry", []):
                res = entry.get("resource", {})
                rows.append(
                    ("ig", res.get("resourceType", ""), json.dumps(res, sort_keys=True))
                )
        elif rt:
            rows.append(("ig", rt, json.dumps(doc, sort_keys=True)))
    return rows


def load_ig_zip(
    spark: SparkSession, zip_path: str, exclusions: list[str] | None = None
) -> DataFrame:
    """IG package zip (definitions.json.zip) → resource frame
    (wstlr/igload/ig_source.py:11-56)."""
    docs = []
    with zipfile.ZipFile(zip_path) as z:
        for name in z.namelist():
            if not name.endswith(".json"):
                continue
            try:
                docs.append((name, json.loads(z.read(name))))
            except json.JSONDecodeError:
                continue
    return spark.createDataFrame(
        _rows_from_named_docs(docs, exclusions or []), RESOURCE_SCHEMA
    )


def load_ig_files(
    spark: SparkSession, paths: list[str], exclusions: list[str] | None = None
) -> DataFrame:
    """Local JSON file/dir variant (wstlr/igload/file_source.py:10-26)."""
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".json")
            )
        else:
            files.append(p)
    docs = []
    for f in files:
        try:
            with open(f) as fh:
                docs.append((f, json.load(fh)))
        except (OSError, json.JSONDecodeError):
            continue
    return spark.createDataFrame(
        _rows_from_named_docs(docs, exclusions or []), RESOURCE_SCHEMA
    )


def load_ig_url(
    spark: SparkSession, url: str, exclusions: list[str] | None = None
) -> DataFrame:
    """URL variant — driver-side fetch; gated behind a runtime import so
    air-gapped environments only pay when called."""
    import urllib.request

    with urllib.request.urlopen(url) as resp:  # noqa: S310 (config-provided URL)
        doc = json.loads(resp.read())
    return spark.createDataFrame(
        _rows_from_named_docs([(url, doc)], exclusions or []), RESOURCE_SCHEMA
    )
