"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for streaming semantics the built-in windows can't
express: per-key mutable state carried across micro-batches with
watermark-driven timeout. Here: a running per-user activity accumulator
(the streaming twin of a groupBy count/sum that never re-reads history).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

_CENT = Decimal("0.01")

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _decode_state(st: tuple, exact_cents: bool) -> tuple[int, int | float, int]:
    """Decode a restored state tuple, tolerating the pre-nv 2-field layout.

    The state schema widened from ``n long, total double`` to include the
    non-null counter ``nv long`` (all-NULL-group SQL-twin semantics). A
    checkpoint written by the 2-field layout decodes here with ``nv``
    defaulted to ``n`` — correct whenever the historic stream carried no
    NULL values (NULLs only became survivable in the same change that
    added ``nv``, so a 2-field checkpoint cannot have counted any).
    Caveat: Spark's own state-schema compatibility check
    (``spark.sql.streaming.stateSchemaCheck``, default on) rejects a
    widened stateStructType before this code runs — to migrate a live
    pre-upgrade checkpoint you must disable that check for the first
    restart; this decoder then makes the restore semantically correct
    rather than a crash at unpack.
    """
    if len(st) == 3:
        n, acc, nv = st
    else:
        n, acc = st
        nv = n
    return int(n), int(acc) if exact_cents else acc, int(nv)


def running_user_totals_stream(
    events: DataFrame, exact_cents: bool = False
) -> DataFrame:
    """Per-user running (n_events, total_value) maintained in group state;
    emits one updated row per user per micro-batch.

    State is O(|users|) regardless of stream length — the pattern for
    billions-of-events streams where windowed aggs would be the wrong
    grain.

    ``exact_cents=True`` accumulates the total as integer cents (the
    fixture values are 2-decimal currency), making the running sum
    independent of batch arrival order and bit-identical to a batch
    ``SUM(CAST(value AS DECIMAL(18,2)))`` — the mode the oracle-checked
    registry query (q88) runs in. Float mode keeps the plain double
    accumulator for non-currency streams.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, acc, nv = _decode_state(state.get, exact_cents)
        else:
            n, acc, nv = 0, 0 if exact_cents else 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            # NULL values reach pandas as NaN: SUM ignores NULLs in SQL
            # (the batch twin this operator is oracle-checked against),
            # so drop them from the accumulator while n still counts the
            # row — COUNT(*) semantics. Unguarded, one null-value event
            # kills the query: Decimal cents raises on NaN. (Deliberate
            # twin deviation: a REAL NaN double — not NULL — is also
            # treated as missing here; the SQL twin would poison the sum
            # or refuse the decimal cast, and a streaming accumulator
            # must not die or go permanently NaN over one corrupt event.)
            vals = pdf["value"].dropna()
            nv += len(vals)
            if exact_cents:
                # Cents via HALF_UP on the SHORTEST DECIMAL REPR of each
                # double — bit-for-bit what both DuckDB's and Spark's
                # double→DECIMAL(18,2) cast do (both stringify then round
                # HALF_UP: 0.125→0.13, 2.675→2.68, 1.005→1.01). A
                # vectorized binary-value round (pandas .round, np.floor
                # (v*100+0.5)) diverges one cent wherever the binary
                # product ties at .5 or the repr carries >2 decimals —
                # test_stateful_exact_cents_matches_duckdb_cast pins
                # these adversarial values. Per-value Decimal is Python-
                # loop cost, acceptable inside an applyInPandasWithState
                # accumulator that is already Python-side.
                acc += int(
                    sum(
                        int(
                            Decimal(repr(float(v)))
                            .quantize(_CENT, rounding=ROUND_HALF_UP)
                            .scaleb(2)
                        )
                        for v in vals
                    )
                )
            else:
                acc += float(vals.sum())
        # The state field is DOUBLE; exact_cents accumulates a Python int,
        # which must be stored as float — an int in a double state field
        # survives the in-process fast path but decodes to None when the
        # state is restored from a checkpoint after a query restart
        # (found by test_stateful_restart_exactly_once; integer cents stay
        # exact in a double up to 2^53, i.e. ~$90T). Restore converts back
        # via int(acc) above.
        state.update((n, float(acc), nv))
        # SQL-twin semantics for a group whose every value was NULL:
        # SUM returns NULL, not 0 — emit None so the streamed total
        # hashes equal to the batch oracle's NULL (nv tracks non-null
        # contributions across restarts, stored as long in state).
        if nv == 0:
            total = None
        else:
            total = acc / 100.0 if exact_cents else acc
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double, nv long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
