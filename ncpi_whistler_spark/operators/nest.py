"""Nesting operators: GROUP BY → content (A1) and embed (J1/J2).

These are the reference's two structural operators — both materialize a
parent row with an array-of-structs child column.

Scale notes (100 TB): both are single-shuffle operations on their key.
``embed`` pre-aggregates the child side *before* the join so the parent
table is joined against one row per key (no row explosion, and the join is
broadcastable whenever the aggregated child side is small). When both sides
are huge, Catalyst picks sort-merge and AQE splits skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ncpi_whistler_spark.functions.core import fix_fieldname


def _split_keys(keys: str | list[str]) -> list[str]:
    if isinstance(keys, str):
        return [fix_fieldname(k) for k in keys.split(",")]
    return [fix_fieldname(k) for k in keys]


def group_to_nested(
    df: DataFrame,
    group_by: str | list[str],
    content_name: str = "content",
    order_by: str | None = None,
) -> DataFrame:
    """A1: one row per distinct key; non-key columns packed into
    ``content: array<struct<...>>``.

    Reference semantics (wstlr/extractor.py:48-88): hash-agg on the
    composite key, content preserves input row order. Spark is unordered,
    so callers that need order-stable content pass ``order_by`` (a row-id
    column captured at scan, SURVEY.md §7 risk 1); the id is used for
    array_sort then dropped from the structs.
    """
    keys = _split_keys(group_by)
    others = [c for c in df.columns if c not in keys and c != order_by]
    if order_by:
        packed = F.struct(F.col(order_by).alias("__ord"), *[F.col(c) for c in others])
        agg = F.transform(
            F.array_sort(F.collect_list(packed)),
            lambda s: F.struct(*[s[c].alias(c) for c in others]),
        )
    else:
        agg = F.array_sort(F.collect_list(F.struct(*[F.col(c) for c in others])))
    return df.groupBy(*keys).agg(agg.alias(content_name))


def embed(
    parent: DataFrame,
    child: DataFrame,
    on: str | list[str],
    child_name: str,
    broadcast_child: bool = True,
    tag_table_name: bool = True,
    keep_keys: bool = False,
) -> DataFrame:
    """J1/J2: left outer join of pre-nested child rows into the parent.

    Reference semantics (wstlr/embedable.py:15-53, wstlr/extractor.py:
    353-366): the child CSV is hash-built into a multimap on the join
    column(s) (comma-separated for composite keys — J2,
    docs/ref/project_config.md:82); each parent row gains
    ``<child_name>: [child rows ∪ {"table_name": name}]``, empty array on
    miss.

    Spark design: groupBy-collect the child to one row per key FIRST, then
    left-join. The grouped child is usually orders of magnitude smaller
    than the parent fact table; with ``broadcast_child`` the parent never
    shuffles (the reference's own motivation — embed exists because it is
    "much faster" than scanning, docs/ref/project_config.md:96).
    """
    keys = _split_keys(on)
    # reference embed rows RETAIN the join column (wstlr/embedable.py:
    # 42-53 stores the whole DictReader line); keep_keys=True mirrors
    # that for whistle-input parity, default drops it (redundant with
    # the parent's key).
    child_cols = [c for c in child.columns if keep_keys or c not in keys]
    fields = [F.col(c) for c in child_cols]
    if tag_table_name:
        fields.insert(0, F.lit(child_name).alias("table_name"))
    nested = child.groupBy(*keys).agg(
        F.array_sort(F.collect_list(F.struct(*fields))).alias(child_name)
    )
    if broadcast_child:
        nested = F.broadcast(nested)
    joined = parent.join(nested, on=keys, how="left")
    # miss → empty array, not NULL (wstlr/embedable.py:46-53)
    empty = F.array().cast(joined.schema[child_name].dataType.simpleString())
    return joined.withColumn(child_name, F.coalesce(F.col(child_name), empty))
