"""Change-data-capture operators: change-log compaction, MERGE-style
upsert/delete application, and SCD2 history derivation.

The reference pipeline rebuilds a study wholesale on every run
(wstlr/play.py drives a full re-extract; there is no incremental path),
which is fine at study scale and fatal at 100 TB. These operators give
the engine the standard incremental-ingest layer: a change log (CDC
feed) is compacted to its latest state per key and merged into the base
table with insert/update/delete semantics — the same contract as SQL
MERGE or Delta Lake's ``MERGE INTO``, expressed as pure DataFrame ops so
it runs on plain parquet.

Scale design:

- ``latest_change_per_key`` is an argmax aggregation — ``max(struct(
  ordering, payload))`` — not a row_number window. Partial aggregation
  combines map-side, so the shuffle carries ~|keys|·partitions rows
  regardless of how many versions each key accumulated (measured:
  SCALEBENCH_CDC.json, 0.25× the input at 64 versions/key on an
  adversarially scattered delta). Note: Spark 3.5+'s
  InsertWindowGroupLimit makes a ``row_number()==1`` window shuffle the
  SAME volume (measured equal) — the argmax is preferred because it is
  shape-robust: no sort at all, and no dependence on the filter
  matching the rank-limit pattern for the optimization to fire.
- ``merge_upsert`` touches the base table with ONE anti join on the
  change keys. When the delta is dimension-sized (the overwhelmingly
  common shape: a day of changes vs years of base), ``broadcast_delta``
  makes the anti join STATICALLY a broadcast (plan-asserted in
  SCALEBENCH_CDC.json) and the 100 TB base is never shuffled at all.
  Without the hint the engine's AQE defaults converge to the same
  broadcast at runtime (measured: both variants' total shuffle is
  delta-scale, below the base row count) — the hint's value is the
  static guarantee when stats would misestimate the compacted delta.
- ``scd2_history`` needs the full version order per key, so a window is
  the honest plan there; one shuffle on the key, sort within partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _contains_unorderable(dtype) -> bool:
    """True if the type (or any nested field) is a MapType — the one
    common column type Spark cannot order, which poisons max(struct)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dtype, MapType):
        return True
    if isinstance(dtype, ArrayType):
        return _contains_unorderable(dtype.elementType)
    if isinstance(dtype, StructType):
        return any(_contains_unorderable(f.dataType) for f in dtype.fields)
    return False


def latest_change_per_key(
    delta: DataFrame,
    keys: list[str],
    seq_col: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Compact a change log to the winning (highest ``seq_col``) row per
    key. Ties on seq are broken by ``tiebreakers`` (struct comparison is
    lexicographic), then — for orderable payloads — by the payload struct
    itself, so the winner is fully deterministic. Callers should still
    make (seq, tiebreakers) total per key: when the payload contains a
    MapType (which Spark cannot order), the op falls back to ``max_by``,
    where a residual tie is scheduler-arbitrary.

    Plan either way: one partial-aggregated argmax — single shuffle of
    ~|distinct keys per partition| combined rows.
    """
    ord_cols = [F.col(seq_col)] + [F.col(c) for c in (tiebreakers or [])]
    payload = F.struct(*[F.col(c) for c in delta.columns])
    grouped = delta.groupBy(*[F.col(k) for k in keys])
    if any(_contains_unorderable(f.dataType) for f in delta.schema.fields):
        # max_by's ordering struct must itself be orderable, but it need
        # not carry the map columns: extend (seq, tiebreakers) with every
        # ORDERABLE payload column so a seq tie is still broken
        # deterministically whenever the orderable part of the payload
        # differs. Only rows identical in ALL orderable columns (same
        # key, seq, tiebreakers, and every non-map field) and differing
        # solely inside a map remain scheduler-arbitrary — a genuinely
        # unorderable residue.
        orderable_tail = [
            F.col(f.name)
            for f in delta.schema.fields
            if not _contains_unorderable(f.dataType)
        ]
        win = grouped.agg(
            F.max_by(payload, F.struct(*ord_cols, *orderable_tail)).alias("__row")
        )
        return win.select("__row.*")
    win = grouped.agg(
        F.max(F.struct(F.struct(*ord_cols).alias("__ord"), payload.alias("__row"))).alias("__m")
    )
    return win.select("__m.__row.*")


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
    tiebreakers: list[str] | None = None,
    broadcast_delta: bool = False,
    evolve: bool = False,
) -> DataFrame:
    """MERGE the change log ``delta`` into ``base``:

    - the latest change per key wins (``latest_change_per_key``);
    - a winning row whose ``op_col`` == ``delete_op`` removes the key;
    - any other winning row replaces the base row (update) or adds a new
      one (insert) — upsert semantics, no matched/not-matched split
      needed because the union below is the same either way.

    ``delta`` must carry every ``base`` column (plus ``seq_col`` /
    ``op_col``); the result has exactly ``base``'s columns. Base rows are
    read once and anti-joined once; they are never sorted or windowed.

    Schema evolution: a delta carrying columns the base lacks (beyond
    ``seq_col``/``op_col``) is a schema change, never a silent drop —
    by default it raises; with ``evolve=True`` the base schema WIDENS:
    new columns are appended (delta column order) with NULL backfill on
    historical base rows, and the result carries base columns + the new
    ones. A delta MISSING a base column still fails loud either way.
    """
    meta = {seq_col} | ({op_col} if op_col else set())
    extra = [c for c in delta.columns if c not in set(base.columns) | meta]
    if extra:
        if not evolve:
            raise ValueError(
                "merge_upsert: delta carries column(s) the base lacks: "
                f"{extra}. A CDC feed whose schema widened is a schema "
                "change, not payload — pass evolve=True to widen the "
                "base (NULL backfill on history) or fix the feed."
            )
        for c in extra:
            base = base.withColumn(
                c, F.lit(None).cast(delta.schema[c].dataType)
            )
    latest = latest_change_per_key(delta, keys, seq_col, tiebreakers)
    changed_keys = latest.select(*keys)
    if broadcast_delta:
        changed_keys = F.broadcast(changed_keys)
    survivors = latest
    if op_col is not None:
        survivors = survivors.where(F.col(op_col) != F.lit(delete_op))
    untouched = base.join(changed_keys, on=keys, how="left_anti")
    return untouched.unionByName(survivors.select(*base.columns))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    op_col: str = "change_op",
    compare_cols: list[str] | None = None,
    pre_col: str | None = None,
) -> DataFrame:
    """Change feed between two snapshots of one table — the OUTBOUND
    direction of CDC (merge_upsert applies a feed; this derives one):
    emits each inserted key as ``I`` (new row), each removed key as
    ``D`` (old row), each key whose payload changed as ``U`` (new row);
    unchanged keys drop out. Applying the emitted feed to ``old`` via
    :func:`merge_upsert` reconstructs ``new`` exactly (test-pinned
    round-trip).

    Payload comparison is NULL-SAFE (struct ``eqNullSafe`` — a column
    flipping between NULL and non-NULL is a real update); restrict it
    with ``compare_cols`` to ignore volatile columns. NULL keys follow
    join semantics: they never match across snapshots, so a NULL-keyed
    row appears as ``D`` (old side) and/or ``I`` (new side).

    Scale shape: ONE full outer join on the keys — a single co-shuffle
    of both snapshots, no window, no sort, and the payload hash-compare
    is a codegen struct equality, not a column-by-column UDF. When both
    snapshots live in identically bucketed layouts the exchange drops
    entirely (storage.write_bucketed). The reference has no diff/export
    path at all (wstlr re-extracts; nothing consumes table history).

    ``pre_col`` additionally emits the OLD payload as a struct column
    (NULL on inserts) — the pre-image a stored change feed needs so
    multiple per-publish feeds can later be netted per key without
    re-reading either snapshot (streaming/cdc.VersionedTable
    ``changes_since``).
    """
    payload = compare_cols or [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*[F.col(c) for c in payload]).alias("__old"))
    n = new.select(*keys, F.struct(*[F.col(c) for c in payload]).alias("__new"))
    j = o.join(n, on=keys, how="full_outer")
    op = (
        F.when(F.col("__old").isNull(), F.lit("I"))
        .when(F.col("__new").isNull(), F.lit("D"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("U"))
    )
    j = j.withColumn(op_col, op).where(F.col(op_col).isNotNull())
    row = F.when(F.col(op_col) == F.lit("D"), F.col("__old")).otherwise(
        F.col("__new")
    )
    tail = [F.col("__old").alias(pre_col)] if pre_col else []
    return j.select(*keys, row.alias("__row"), F.col(op_col), *tail).select(
        *keys, "__row.*", op_col, *([pre_col] if pre_col else [])
    )


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    current_flag: str = "is_current",
    valid_from: str = "valid_from_seq",
    valid_to: str = "valid_to_seq",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: each change row becomes a
    version with ``[valid_from_seq, valid_to_seq)`` validity and an
    ``is_current`` marker on the open version (``valid_to_seq`` NULL).

    One shuffle on the key; ``lead`` over (key, seq) closes each version
    with the next version's seq. ``seq_col`` must be unique per key
    (change logs are; enforce upstream with latest_change_per_key over
    (key, seq) if a feed can duplicate).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).asc())
    nxt: Column = F.lead(F.col(seq_col)).over(w)
    return (
        changes.withColumn(valid_from, F.col(seq_col))
        .withColumn(valid_to, nxt)
        .withColumn(current_flag, F.col(valid_to).isNull())
    )
