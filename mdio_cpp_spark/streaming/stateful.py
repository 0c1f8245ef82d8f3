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


# --------------------------------------------------------------------------
# Streaming AS-OF enrichment: each event carries its key's latest
# prior-or-equal reference value (the stream-stream as-of — enriching a
# click stream with the last trade/price/config per key). State is the
# MINIMUM possible: one (ts, value) pair per key. Contract: per-key
# in-order delivery across micro-batches (a time-ordered log / the tailing
# mdio source); late rows would need watermark-bounded reordering, which
# this operator intentionally does not buffer for. Within a batch, rows
# sort by (ts, value) so equal-timestamp updates resolve exactly like the
# batch operator's (ts, value)-struct max — availableNow over ordered
# input must equal joins.asof_join, which the parity test pins.

ASOF_OUT_SCHEMA = "event_id bigint, user_id bigint, ts timestamp, ref double"
ASOF_STATE_SCHEMA = "pts_us bigint, pv double"


def _asof_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    pts_us, pv = state.get if state.exists else (None, None)
    batch = pd.concat(list(pdfs), ignore_index=True)
    # (ts, value) order: equal-ts reference updates apply smaller-value
    # first, so the LAST applied (the max) matches the batch operator's
    # struct-max tie rule
    batch = batch.sort_values(["ts", "value"], kind="mergesort")
    out_ids, out_ts, out_ref = [], [], []
    for row in batch.itertuples(index=False):
        ts_us = int(row.ts.value // 1_000)  # pandas ns → µs
        if bool(row.is_ref):
            if (
                pts_us is None
                or ts_us > pts_us
                or (ts_us == pts_us and float(row.value) > (pv if pv is not None else float("-inf")))
            ):
                pts_us, pv = ts_us, float(row.value)
        out_ids.append(int(row.event_id))
        out_ts.append(row.ts)
        out_ref.append(pv)
    state.update((pts_us, pv))
    yield pd.DataFrame(
        {"event_id": out_ids, "user_id": user_id, "ts": out_ts, "ref": out_ref}
    )


def asof_enrich_stream(events: DataFrame, ref_predicate: str) -> DataFrame:
    """Enrich every event with its key's latest prior-or-equal reference
    value (rows matching ``ref_predicate`` are the reference side; they
    enrich themselves too, matching ASOF's inclusive bound). Append output:
    each input row is emitted exactly once, already enriched."""
    from pyspark.sql import functions as F

    tagged = events.select(
        "event_id", "user_id", "ts", "value",
        F.expr(ref_predicate).cast("boolean").alias("is_ref"),
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        _asof_update,
        outputStructType=ASOF_OUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming CDC view: latest-per-key state (the materialized "current row"
# a changelog stream maintains — Kafka-compaction semantics as an operator).

LPK_OUTPUT_SCHEMA = "user_id bigint, last_seq bigint, last_type string, last_value double"
LPK_STATE_SCHEMA = "seq bigint, eid bigint, t string, v double"


def _latest_per_key_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    cur = tuple(state.get) if state.exists else None
    for pdf in pdfs:
        row = pdf.sort_values(["seq", "event_id"]).iloc[-1]
        cand = (int(row["seq"]), int(row["event_id"]),
                str(row["event_type"]), float(row["value"]))
        if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
            cur = cand
    state.update(cur)
    yield pd.DataFrame({
        "user_id": [user_id], "last_seq": [cur[0]],
        "last_type": [cur[2]], "last_value": [cur[3]],
    })


def latest_per_key(changes: DataFrame) -> DataFrame:
    """Maintain the CURRENT version per key over a change stream: one
    (seq, id, payload) tuple of state per key — O(distinct keys), the
    Kafka-compacted-topic materialization. Update mode re-emits a key
    only when a micro-batch touches it; superseded versions never leave
    the executor. Input columns: user_id, seq, event_id, event_type,
    value (seq+event_id form the total version order)."""
    return (
        changes.select("user_id", "seq", "event_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _latest_per_key_update,
            outputStructType=LPK_OUTPUT_SCHEMA,
            stateStructType=LPK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
