"""Whistle-output JSON document source (S6; reference wstlr/bundle.py:30-56).

The reference parses one big ``{module: [resources]}`` JSON and pushes each
resource through consumer callbacks. Here the document becomes a resource
DataFrame ``(module, resourceType, resource_json)`` — the shape every sink
and inspector consumes — via a JVM-side parse (spark.read.json for files,
parallelized parse for in-memory documents).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RESOURCE_SCHEMA = "module string, resourceType string, resource_json string"


def parse_bundle_dict(spark: SparkSession, document: dict) -> DataFrame:
    """In-memory whistle-output document → resource frame. The driver
    flattens only (module, serialized resource) pairs — cheap strings —
    and Spark owns everything after."""
    rows = []
    for module, resources in document.items():
        if not isinstance(resources, list):
            continue
        for r in resources:
            rows.append((module, r.get("resourceType", ""), json.dumps(r, sort_keys=True)))
    return spark.createDataFrame(rows, RESOURCE_SCHEMA)


def read_bundle_json(spark: SparkSession, path: str) -> DataFrame:
    """File variant: read the document with Spark's JSON reader (one row,
    map of module → array) and explode to resource rows."""
    raw = spark.read.option("multiLine", True).json(path)
    frames = []
    for module in raw.columns:
        field = raw.schema[module].dataType
        if not field.typeName() == "array":
            continue
        frames.append(
            raw.select(F.explode(F.col(module)).alias("r")).select(
                F.lit(module).alias("module"),
                F.col("r.resourceType").alias("resourceType"),
                F.to_json("r").alias("resource_json"),
            )
        )
    if not frames:
        return spark.createDataFrame([], RESOURCE_SCHEMA)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
