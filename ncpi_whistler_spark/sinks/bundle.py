"""Transaction-bundle sink (S9; reference wstlr/bundle.py:68-188).

Reference behavior: stream resources into Bundle JSON files chunked at
15,000 records, dedup entries on fullUrl, request verb PUT when the
resource already has an id else POST, and process the ``patient`` module
before all others (O1, wstlr/bundle.py:37-42).

Spark design: dedup is ``dropDuplicates`` on the computed fullUrl; the
15k cap maps to ``maxRecordsPerFile`` so the distributed writer enforces
chunking without a driver loop; module ordering becomes a partition
column plus an explicit patient-first sort key for consumers that load
files in name order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUNDLE_CHUNK = 15_000  # wstlr/bundle.py:84


def prepare_bundle_entries(resources: DataFrame, id_col: str | None = None) -> DataFrame:
    """Resource rows (module, resourceType, resource_json [, id]) →
    bundle entries with fullUrl, verb, dedup, and the patient-first order
    key."""
    df = resources
    ident = F.coalesce(
        F.get_json_object("resource_json", "$.identifier[0].value"),
        F.sha1(F.col("resource_json")),
    )
    df = df.withColumn(
        "fullUrl",
        F.concat_ws("/", F.lit("urn:whistler"), F.col("resourceType"), ident),
    )
    has_id = (
        F.get_json_object("resource_json", "$.id").isNotNull()
        if id_col is None
        else F.col(id_col).isNotNull()
    )
    df = df.withColumn(
        "request",
        F.struct(
            F.when(has_id, F.lit("PUT")).otherwise(F.lit("POST")).alias("method"),
            F.when(
                has_id,
                F.concat_ws(
                    "/",
                    F.col("resourceType"),
                    F.get_json_object("resource_json", "$.id"),
                ),
            )
            .otherwise(F.col("resourceType"))
            .alias("url"),
        ),
    )
    # URL dedup (wstlr/bundle.py:150-174)
    df = df.dropDuplicates(["fullUrl"])
    # patient module first (wstlr/bundle.py:37-42)
    return df.withColumn(
        "load_order",
        F.when(F.col("module") == "patient", F.lit(0)).otherwise(F.lit(1)),
    )


def write_bundles(entries: DataFrame, out_dir: str, chunk: int = BUNDLE_CHUNK) -> None:
    """Write chunked bundle-entry files partitioned by (load_order,
    module): file count and per-file record caps are handled by the
    distributed writer — no driver-side chunk loop."""
    (
        entries.repartition("module")
        .sortWithinPartitions("load_order", "fullUrl")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", chunk)
        .partitionBy("load_order", "module")
        .json(out_dir)
    )
