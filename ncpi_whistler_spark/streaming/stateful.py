"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for streaming semantics the built-in windows can't
express: per-key mutable state carried across micro-batches with
watermark-driven timeout. Here: a running per-user activity accumulator
(the streaming twin of a groupBy count/sum that never re-reads history).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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
            n, acc = state.get
            if exact_cents:
                acc = int(acc)
        else:
            n, acc = 0, 0 if exact_cents else 0.0
        for pdf in pdfs:
            n += len(pdf)
            if exact_cents:
                acc += int(pdf["value"].mul(100).round().sum())
            else:
                acc += float(pdf["value"].sum())
        state.update((n, acc))
        total = acc / 100.0 if exact_cents else acc
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
