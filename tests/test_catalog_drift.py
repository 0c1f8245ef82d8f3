"""Regression test for driver testdata schema drift on events.ts.

Round 3's driver regenerated events.parquet with ts as TIMESTAMP(MICROS,
isAdjustedToUTC=false) where earlier rounds shipped TIMESTAMP(NANOS) (which
Spark surfaces as bigint under spark.sql.legacy.parquet.nanosAsLong) — and 7
queries failed the round gate on `ts div 1000`. catalog.table probes the
footer schema and normalizes BOTH; this pins each path with a synthetic
parquet so the next drift is caught locally, not by the round gate.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from mdio_cpp_spark.catalog import table

_ROWS = [
    (0, datetime.datetime(2024, 1, 1, 0, 0, 7, 179575), 8, "error", 6.55, '{"k": 69}'),
    (1, datetime.datetime(2024, 1, 2, 12, 30, 0, 500000), 46, "click", 12.31, '{"k": 89}'),
]


def _write_events(tmpdir: str, ts_variant: str) -> str:
    if ts_variant == "nanos_as_long":
        ts_arr = pa.array(
            [int(r[1].timestamp() * 1_000_000) * 1000 for r in _ROWS], pa.int64()
        )
    else:  # micros timestamp (current driver rounds)
        ts_arr = pa.array([r[1] for r in _ROWS], pa.timestamp("us"))
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS]),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS]),
        }
    )
    pq.write_table(t, f"{tmpdir}/events.parquet")
    return tmpdir


def test_events_ts_normalized_both_variants(spark, tmp_path):
    got = {}
    for variant in ("nanos_as_long", "micros_ts"):
        d = tmp_path / variant
        d.mkdir()
        _write_events(str(d), variant)
        rows = table(spark, str(d), "events").select("event_id", "ts").orderBy("event_id").collect()
        got[variant] = [(r["event_id"], r["ts"]) for r in rows]
    # both variants must normalize to the same session-tz timestamps
    assert got["nanos_as_long"] == got["micros_ts"]
    assert got["micros_ts"][0][1] == _ROWS[0][1]
    assert got["micros_ts"][1][1] == _ROWS[1][1]
