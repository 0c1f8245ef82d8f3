"""Custom stateful streaming operator via applyInPandasWithState.

The brief's "custom stateful operators" slot: a per-user running aggregate
(event count + value sum) maintained in explicit GroupState — the shape you
use when session_window/window aggregates can't express the state machine
(per-key counters, custom eviction, cross-batch carryover).

Design rule mirrors streaming/events.py: the state transition is a pure
function over (key, iterator-of-batches, state), applied identically however
many micro-batches the stream delivers — so an availableNow one-shot run
must equal the batch groupBy, which is exactly what the parity test pins.

State size: one (count, sum) pair per user — O(distinct keys), the minimum
for this aggregate; timeouts are disabled (the batch-parity contract has no
late-data eviction).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, s double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += int(len(pdf))
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [round(s, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user totals over a stream (update output mode: each
    micro-batch emits the keys it touched with their cumulative totals)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
