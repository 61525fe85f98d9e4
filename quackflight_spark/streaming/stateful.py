"""Custom stateful streaming operator — applyInPandasWithState.

Beyond-reference (SURVEY §2.9: the reference has no stateful streaming);
this is the Structured Streaming pattern for operators that need
arbitrary per-key state across micro-batches. The demo operator keeps a
running (count, sum) per user_id — the building block for incremental
sessionization / rate counters.

State lives in the state store (checkpointed, per-key, partitioned by
the groupBy key) — no driver state, scales with executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum(value)) per user across micro-batches."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [round(total, 2)]})


def attach(grouped):
    """events.groupBy('user_id') → streaming running totals."""
    return grouped.applyInPandasWithState(
        running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
