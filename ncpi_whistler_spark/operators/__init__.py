"""Dataflow + analytics operators.

Whistler-parity (SURVEY.md §2): ``nest`` (group-by→content, embed),
``aggregators`` (wide→long pivot), ``harmonize`` (broadcast ConceptMap
join), ``profiling`` (summaries/min-max/value-counts).

Scale extensions: ``relational`` (top-k per group, sequential codes,
as-of join), ``dedup`` (exact/minhash/simhash/ngram/embedding),
``similarity`` (cosine top-k), ``text`` (lang-id/quality/tokens/
fingerprints), ``multimodal`` (binary columns + Arrow UDF plumbing),
``cdc`` (change-log compaction, MERGE upsert/delete, SCD2 history).
"""

from ncpi_whistler_spark.operators.nest import group_to_nested, embed
from ncpi_whistler_spark.operators.aggregators import aggregate_columns
from ncpi_whistler_spark.operators.harmonize import harmonize, add_display_columns
from ncpi_whistler_spark.operators.cdc import (
    latest_change_per_key,
    merge_upsert,
    scd2_history,
    table_diff,
)

__all__ = [
    "group_to_nested",
    "embed",
    "aggregate_columns",
    "harmonize",
    "add_display_columns",
    "latest_change_per_key",
    "merge_upsert",
    "scd2_history",
    "table_diff",
]
