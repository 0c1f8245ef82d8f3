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

from typing import Iterable, Iterator

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


# --------------------------------------------------------------------------
# The same operator on the NEW Spark 4 API (transformWithStateInPandas):
# typed per-key ValueState managed by a StatefulProcessor class. This is the
# forward path for custom state machines (multiple state variables, TTL,
# timers); the applyInPandasWithState version above remains for the
# classic API. Both must agree with the batch groupBy — pinned in
# tests/test_streaming.py (importorskip'd: the TWS runner needs a working
# protobuf wheel, which this container lacks — the operator itself is
# complete and runs wherever `google.protobuf.descriptor` imports).

try:  # Spark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _UserTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, s = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += int(len(pdf))
                s += float(pdf["value"].sum())
            self._state.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
            )

        def close(self) -> None:
            pass

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        """running_user_totals on transformWithStateInPandas (typed
        ValueState). Same state size (one pair per key), same output
        contract."""
        return (
            events.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_UserTotalsProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover — older Spark
    running_user_totals_tws = None  # type: ignore[assignment]
