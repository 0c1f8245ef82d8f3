"""Structured Streaming parity: the stream path (readStream + watermark +
Trigger.availableNow) must produce exactly the batch twin's result — the
design rule in streaming/events.py (one pure transformation applied to both
sources)."""

from __future__ import annotations

import tempfile

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.streaming.events import (
    ohlc_bars,
    sliding_event_rate,
    stream_ohlc_bars,
    stream_sliding_rate,
    stream_windowed_agg,
    windowed_event_agg,
)


def test_stream_windowed_agg_matches_batch(spark, sf_dir):
    batch = (
        windowed_event_agg(table(spark, sf_dir, "events"))
        .orderBy("ws", "event_type")
        .collect()
    )
    stream_df = stream_windowed_agg(spark, sf_dir)
    assert stream_df.isStreaming
    with tempfile.TemporaryDirectory(dir="/root/repo/.zarr_cache") as ckpt:
        q = (
            stream_df.writeStream.format("memory")
            .queryName("stream_parity")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    streamed = spark.sql("SELECT * FROM stream_parity").orderBy("ws", "event_type").collect()
    assert len(streamed) == len(batch) and len(batch) > 0
    assert streamed == batch


def test_session_window_counts_match_batch_sessionize(spark, sf_dir):
    """Stateful streaming sessionization (F.session_window, 30-min gap) must
    agree with the batch lag/running-sum formulation on the per-user session
    COUNT — the two formulations label sessions differently but must carve
    the same boundaries."""
    import tempfile

    from pyspark.sql import functions as F

    from mdio_cpp_spark.catalog import table
    from mdio_cpp_spark.streaming.events import sessionize, stream_events

    batch = (
        sessionize(table(spark, sf_dir, "events"), gap_seconds=1800)
        .groupBy("user_id")
        .agg(F.max("session_seq").alias("n_sessions"))
    )
    stream = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    with tempfile.TemporaryDirectory(dir="/root/repo/.zarr_cache") as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("sess_parity")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    streamed = (
        spark.sql("SELECT user_id, COUNT(*) AS n_sessions FROM sess_parity GROUP BY user_id")
    )
    b = {r["user_id"]: r["n_sessions"] for r in batch.collect()}
    s = {r["user_id"]: r["n_sessions"] for r in streamed.collect()}
    assert b == s and len(b) > 0


def test_applyInPandasWithState_matches_batch(spark, sf_dir):
    """Custom stateful operator (explicit GroupState) — the final state per
    user after draining the stream must equal the batch aggregate."""
    import tempfile

    from pyspark.sql import functions as F

    from mdio_cpp_spark.catalog import table
    from mdio_cpp_spark.streaming.events import stream_events
    from mdio_cpp_spark.streaming.stateful import running_user_totals

    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    stream = running_user_totals(stream_events(spark, sf_dir))
    with tempfile.TemporaryDirectory(dir="/root/repo/.zarr_cache") as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("state_parity")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    # update mode can emit a key several times (one per micro-batch); the
    # LAST emission per key is the final state — max n_events wins
    rows = spark.sql(
        "SELECT user_id, MAX_BY(n_events, n_events) n, MAX_BY(sum_value, n_events) s "
        "FROM state_parity GROUP BY user_id"
    ).collect()
    streamed = {r["user_id"]: (r["n"], r["s"]) for r in rows}
    assert streamed == batch and len(batch) > 0


def test_stream_write_array_ingest(spark, tmp_path):
    """Streaming micro-batches land in a zarr array through the chunk-aligned
    writer; cross-batch partial-chunk coverage must merge (RMW), and the
    result must equal a single batch write of the same rows."""
    import numpy as np
    from pyspark.sql import functions as F

    from mdio_cpp_spark.sources.zarr_store import ZarrStore
    from mdio_cpp_spark.streaming.ingest import stream_write_array

    src_dir = str(tmp_path / "src")
    n = 500
    # 5 parquet files → availableNow processes them as micro-batches
    for part in range(5):
        (
            spark.range(part * 100, (part + 1) * 100)
            .select(F.col("id").alias("i"), (F.col("id") * 2.0).alias("value"))
            .coalesce(1)
            .write.mode("append").parquet(src_dir)
        )
    root = str(tmp_path / "ingest.zarr")
    st = ZarrStore.create(root, version=2)
    # chunk=150 straddles every batch boundary → exercises cross-batch RMW
    st.create_array("v", shape=(n,), chunks=(150,), dtype="float64", dims=("i",))
    st.consolidate()
    stream = (
        spark.readStream.schema("i long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_write_array(stream, root, "v", checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert np.array_equal(ZarrStore.open(root).read_array("v"), np.arange(n) * 2.0)


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed agg with a watermark: an event arriving in a
    later micro-batch but timestamped far before the advanced watermark is
    dropped — its window never emits, on-time counts are unaffected.

    Uses a LIVE processingTime trigger on purpose: in this Spark build,
    Trigger.AvailableNow pre-plans its micro-batches and does NOT apply the
    late-record filter between them (numRowsDroppedByWatermark stays 0 and
    the stale window emits) — verified empirically; the live trigger shows
    the documented drop behavior."""
    import time

    from pyspark.sql import functions as F

    from mdio_cpp_spark.streaming.events import windowed_event_agg

    src = str(tmp_path / "late_src")

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts_s string, value double"
        ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "value",
                 F.lit("click").alias("event_type"))

    mk([(i, f"2024-01-01 10:{m:02d}:30", 1.0) for i, m in enumerate([0, 1, 2, 30, 31])]) \
        .coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    out = windowed_event_agg(stream, "1 minute")
    q = (
        out.writeStream.format("memory").queryName("late_test")
        .outputMode("append").trigger(processingTime="500 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        def wait_rows(target, timeout=60):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if sum(p["numInputRows"] for p in q.recentProgress) >= target:
                    return
                time.sleep(0.5)
            raise TimeoutError(f"stream never processed {target} rows")

        wait_rows(5)  # watermark now 10:21:30
        # a whole day late — far beyond the 10-minute allowance
        mk([(99, "2023-12-31 09:00:30", 7.0)]).coalesce(1).write.mode("append").parquet(src)
        wait_rows(6)
        time.sleep(2)  # one more tick so the batch's metrics land
    finally:
        q.stop()
    dropped = sum(
        (p.get("stateOperators") or [{}])[0].get("numRowsDroppedByWatermark") or 0
        for p in q.recentProgress
    )
    assert dropped >= 1
    rows = {r["ws"].strftime("%m-%d %H:%M"): r["n_events"] for r in spark.sql(
        "SELECT * FROM late_test").collect()}
    assert rows.get("01-01 10:00") == 1 and rows.get("01-01 10:01") == 1
    assert not any(k.startswith("12-31") for k in rows)


def test_stream_stream_interval_join_parity(spark, sf_dir, tmp_path):
    """Watermarked stream-stream interval join (availableNow) must produce
    exactly the batch interval_join rows — inner-join results are emittable
    without waiting for watermark closure, so the one-shot run is complete."""
    from pyspark.sql import functions as F

    from mdio_cpp_spark.catalog import table
    from mdio_cpp_spark.streaming.events import interval_join, stream_events

    batch = table(spark, sf_dir, "events")
    expected = sorted(
        (r["l_event_id"], r["r_event_id"])
        for r in interval_join(
            batch.filter(F.col("event_type") == "signup").select("event_id", "user_id", "ts"),
            batch.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts"),
            key="user_id", time_col="ts", max_gap_seconds=1800,
        ).collect()
    )

    src = stream_events(spark, sf_dir)
    left = (src.filter(F.col("event_type") == "signup")
            .select("event_id", "user_id", "ts").withWatermark("ts", "1 hour"))
    right = (src.filter(F.col("event_type") == "error")
             .select("event_id", "user_id", "ts").withWatermark("ts", "1 hour"))
    joined = interval_join(left, right, key="user_id", time_col="ts", max_gap_seconds=1800)
    q = (
        joined.writeStream.format("memory").queryName("ssj")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = sorted((r["l_event_id"], r["r_event_id"]) for r in spark.sql("SELECT * FROM ssj").collect())
    assert got == expected and len(got) > 0


def test_stream_dedup_parity(spark, sf_dir, tmp_path):
    """Watermarked streaming dedup over a replayed source (the same events
    file delivered twice) must restore exactly the batch-distinct row set —
    the at-least-once → exactly-once recovery dedup_events implements."""
    import shutil

    from pyspark.sql import functions as F

    from mdio_cpp_spark.catalog import table
    from mdio_cpp_spark.streaming.events import dedup_events, stream_events_raw

    src_dir = tmp_path / "replayed"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "delivery_1.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "delivery_2.parquet")

    # deliveries arrive as separate micro-batches
    raw = stream_events_raw(spark, str(src_dir), max_files_per_trigger=1)
    q = (
        dedup_events(raw, watermark="1 hour")
        .select("event_id")
        .writeStream.format("memory").queryName("dedup_test")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = sorted(r["event_id"] for r in spark.sql("SELECT * FROM dedup_test").collect())
    expected = sorted(r["event_id"] for r in table(spark, sf_dir, "events").collect())
    assert got == expected and len(got) > 0


def test_stream_static_enrich_matches_batch(spark, sf_dir):
    """Stream-static broadcast join parity: streamed events enriched against
    a static reference table must equal the batch twin row-for-row."""
    import tempfile

    from mdio_cpp_spark.streaming.events import (
        enrich_with_type_stats,
        stream_events,
        type_reference_stats,
    )

    e = table(spark, sf_dir, "events")
    ref = type_reference_stats(e)
    batch = enrich_with_type_stats(e, ref).orderBy("event_id").collect()

    stream_df = enrich_with_type_stats(stream_events(spark, sf_dir), ref)
    assert stream_df.isStreaming
    with tempfile.TemporaryDirectory(dir="/root/repo/.zarr_cache") as ckpt:
        q = (
            stream_df.writeStream.format("memory")
            .queryName("enrich_parity")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    streamed = spark.sql("SELECT * FROM enrich_parity").orderBy("event_id").collect()
    assert len(streamed) == len(batch) > 0
    assert streamed == batch


def test_approx_sketches_within_envelope(spark, sf_dir):
    """The RAW HLL++/KLL estimates must land within the declared ±5 %
    envelope of the exact answers (the audit behind a09's hash-gated
    envelope booleans — this is where the raw-estimate form lives now),
    and a09 itself must report every flag as 1."""
    from pyspark.sql import functions as F

    from mdio_cpp_spark.plans import REGISTRY

    e = table(spark, sf_dir, "events")
    raw = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10_000).alias("approx_p50"),
            F.count_distinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert len(raw) > 0
    for et, r in raw.items():
        assert abs(r["approx_users"] - r["users"]) <= max(2, 0.05 * r["users"])
        assert abs(r["approx_p50"] - r["p50"]) <= max(1e-6, 0.05 * abs(r["p50"]))
    flags = REGISTRY["a09_approx_sketches"].spark(spark, sf_dir).collect()
    assert set(r["event_type"] for r in flags) == set(raw)
    for r in flags:
        assert r["hll_within_5pct"] == 1 and r["kll_within_5pct"] == 1
        assert r["exact_users"] == raw[r["event_type"]]["users"]


def test_transformWithState_matches_batch(spark, sf_dir):
    """The Spark-4 typed-state API (transformWithStateInPandas) must produce
    the same final per-user totals as the batch aggregate and the classic
    applyInPandasWithState operator."""
    import tempfile

    import pytest
    from pyspark.sql import functions as F

    from mdio_cpp_spark.streaming import stateful
    from mdio_cpp_spark.streaming.events import stream_events

    if stateful.running_user_totals_tws is None:
        pytest.skip("transformWithStateInPandas unavailable")
    # the TWS driver worker needs a working protobuf wheel (absent in this
    # container: `from google.protobuf import descriptor` ImportErrors and
    # the runner crashes with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE)
    pytest.importorskip("google.protobuf.descriptor")

    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    stream = stateful.running_user_totals_tws(stream_events(spark, sf_dir))
    with tempfile.TemporaryDirectory(dir="/root/repo/.zarr_cache") as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("tws_parity")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    rows = spark.sql(
        "SELECT user_id, MAX_BY(n_events, n_events) n, MAX_BY(sum_value, n_events) s "
        "FROM tws_parity GROUP BY user_id"
    ).collect()
    streamed = {r["user_id"]: (r["n"], r["s"]) for r in rows}
    assert streamed == batch and len(batch) > 0


def test_streaming_asof_enrich_parity(spark, sf_dir, tmp_path):
    """Streaming as-of enrichment (one (ts, value) state pair per key) over
    time-ordered micro-batches must equal the BATCH as-of join on the same
    rows — including the inclusive equal-ts bound and the cross-batch
    carry (the time split guarantees state crosses a batch boundary)."""
    import tempfile

    from pyspark.sql import functions as F

    from mdio_cpp_spark.operators import joins
    from mdio_cpp_spark.streaming.stateful import asof_enrich_stream

    ev_all = table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value", "event_type")

    # batch ground truth: latest prior-or-equal purchase per user
    e = ev_all.select("event_id", "user_id", "ts")
    p = ev_all.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("value").alias("pv")
    )
    batch = {
        r["event_id"]: r["pv"]
        for r in joins.asof_join(e, p, "ts", "pts", ["pv"],
                                 partition_keys=["user_id"], how="left").collect()
    }

    # two time-ordered files → two in-order micro-batches (state must carry)
    mid = ev_all.agg(F.expr("percentile_approx(unix_micros(ts), 0.5)")).first()[0]
    src = str(tmp_path / "asof_src")
    (ev_all.filter(F.unix_micros("ts") <= mid).orderBy("ts", "event_id").coalesce(1)
     .write.mode("overwrite").parquet(src + "/b0"))
    (ev_all.filter(F.unix_micros("ts") > mid).orderBy("ts", "event_id").coalesce(1)
     .write.mode("overwrite").parquet(src + "/b1"))
    import shutil as _sh
    import glob as _gl
    feed = str(tmp_path / "feed")
    import os as _os
    _os.makedirs(feed)
    for i, part in enumerate(sorted(_gl.glob(src + "/b*/part-*.parquet"))):
        _sh.copy(part, f"{feed}/{i:02d}.parquet")

    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp, value double, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    enriched = asof_enrich_stream(stream, "event_type = 'purchase'")
    with tempfile.TemporaryDirectory(dir="/root/repo/.zarr_cache") as ckpt:
        q = (
            enriched.writeStream.format("memory").queryName("asof_parity")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    streamed = {r["event_id"]: r["ref"] for r in spark.sql("SELECT * FROM asof_parity").collect()}
    assert len(streamed) == len(batch) > 0
    diffs = {k for k in batch if streamed.get(k) != batch[k]
             and not (streamed.get(k) is None and batch[k] is None)}
    assert not diffs, f"{len(diffs)} mismatches, e.g. {sorted(diffs)[:5]}"


def test_latest_per_key_cdc_matches_batch(spark, sf_dir):
    """Streaming CDC view (latest-per-key GroupState) — after draining the
    stream, the current row per user must equal the batch max_by."""
    import tempfile

    from pyspark.sql import functions as F

    from mdio_cpp_spark.catalog import table
    from mdio_cpp_spark.streaming.events import stream_events
    from mdio_cpp_spark.streaming.stateful import latest_per_key

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    batch = {
        r["user_id"]: (r["last_seq"], r["last_type"], r["last_value"])
        for r in table(spark, sf_dir, "events")
        .select("user_id", us.alias("seq"), "event_id", "event_type", "value")
        .groupBy("user_id")
        .agg(F.max_by(F.struct("seq", "event_type", "value"),
                      F.struct("seq", "event_id")).alias("c"))
        .select("user_id", F.col("c.seq").alias("last_seq"),
                F.col("c.event_type").alias("last_type"),
                F.col("c.value").alias("last_value"))
        .collect()
    }
    stream = latest_per_key(
        stream_events(spark, sf_dir).select(
            "user_id", us.alias("seq"), "event_id", "event_type", "value"
        )
    )
    with tempfile.TemporaryDirectory(dir="/root/repo/.zarr_cache") as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("cdc_parity")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    rows = spark.sql(
        "SELECT user_id, MAX_BY(last_seq, last_seq) s, MAX_BY(last_type, last_seq) t, "
        "MAX_BY(last_value, last_seq) v FROM cdc_parity GROUP BY user_id"
    ).collect()
    streamed = {r["user_id"]: (r["s"], r["t"], r["v"]) for r in rows}
    assert streamed == batch and len(batch) > 0


def test_stream_window_topk_parity(spark, sf_dir):
    """Streaming windowed top-k: windowed counts drain in update mode, the
    rank applies at the sink — final top-3 per window must equal st07's
    batch twin."""
    import tempfile

    from pyspark.sql import functions as F

    from mdio_cpp_spark.plans import REGISTRY
    from mdio_cpp_spark.streaming.events import stream_events

    batch = {
        (r["win_start"], r["rk"]): (r["event_type"], r["n"])
        for r in REGISTRY["st07_stream_window_topk"].spark(spark, sf_dir).collect()
    }
    counts = (
        stream_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    with tempfile.TemporaryDirectory(dir="/root/repo/.zarr_cache") as ckpt:
        q = (
            counts.writeStream.format("memory")
            .queryName("wtopk")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    rows = spark.sql(
        """
        SELECT * FROM (
          SELECT win_start, event_type, n,
                 ROW_NUMBER() OVER (PARTITION BY win_start
                                    ORDER BY n DESC, event_type) AS rk
          FROM (SELECT win_start, event_type, MAX(n) AS n
                FROM wtopk GROUP BY win_start, event_type)
        ) WHERE rk <= 3
        """
    ).collect()
    streamed = {(r["win_start"], r["rk"]): (r["event_type"], r["n"]) for r in rows}
    assert streamed == batch and len(batch) > 0


def test_sliding_rate_parity(spark, sf_dir):
    """st08's contract: the sliding-window (10 min / 5 min hop) rate from
    the streaming path equals the batch twin exactly — every event in
    BOTH its overlapping windows on both paths."""
    batch = (
        sliding_event_rate(table(spark, sf_dir, "events"))
        .orderBy("ws", "event_type")
        .collect()
    )
    stream_df = stream_sliding_rate(spark, sf_dir)
    assert stream_df.isStreaming
    with tempfile.TemporaryDirectory(dir="/root/repo/.zarr_cache") as ckpt:
        q = (
            stream_df.writeStream.format("memory")
            .queryName("sliding_parity")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    streamed = spark.sql("SELECT * FROM sliding_parity").orderBy("ws", "event_type").collect()
    assert len(streamed) == len(batch) and len(batch) > 0
    assert streamed == batch


def test_ohlc_parity(spark, sf_dir):
    """st09's contract: hourly OHLC bars from the streaming path equal the
    batch twin exactly — min_by/max_by open/close must merge correctly
    across streaming state updates (pair-mergeable, not order-dependent)."""
    batch = (
        ohlc_bars(table(spark, sf_dir, "events"))
        .orderBy("ws", "event_type")
        .collect()
    )
    stream_df = stream_ohlc_bars(spark, sf_dir)
    assert stream_df.isStreaming
    with tempfile.TemporaryDirectory(dir="/root/repo/.zarr_cache") as ckpt:
        q = (
            stream_df.writeStream.format("memory")
            .queryName("ohlc_parity")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    streamed = (
        spark.sql("SELECT * FROM ohlc_parity").orderBy("ws", "event_type").collect()
    )
    assert len(streamed) == len(batch) and len(batch) > 0
    assert streamed == batch


def test_a09_null_user_id_matches_count_distinct(spark, tmp_path):
    """COUNT(DISTINCT user_id) excludes NULLs; a09's two-phase exact twin
    must too (ADVICE r9). Differential vs DuckDB on a corpus that HAS null
    user_ids — including one event_type whose users are ALL null (the
    left-join + coalesce edge: exact_users must come back 0, not a dropped
    row)."""
    import duckdb
    import pandas as pd

    from mdio_cpp_spark.plans import REGISTRY

    pdf = pd.DataFrame(
        {
            "event_id": range(12),
            "event_type": ["click"] * 6 + ["ghost"] * 3 + ["view"] * 3,
            "user_id": [1, 1, 2, None, 3, None, None, None, None, 4, 4, None],
            "value": [float(i) for i in range(12)],
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(range(12), unit="min"),
        }
    )
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/events.parquet", index=False)

    got = (
        REGISTRY["a09_approx_sketches"].spark(spark, sf)
        .toPandas().reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(REGISTRY["a09_approx_sketches"].oracle).df()
    assert list(got["event_type"]) == ["click", "ghost", "view"]
    assert list(got["exact_users"]) == list(want["exact_users"]) == [3, 0, 1]
    assert list(got["hll_within_5pct"]) == list(want["hll_within_5pct"])
    # kll flags are NOT asserted here: on a 6-value group percentile_approx
    # returns a data value while quantile_cont interpolates between two, so
    # the ±5 % envelope legitimately differs engine-to-engine at tiny n —
    # the envelope contract assumes production-sized groups (see a09's
    # docstring); this test pins only the NULL-user_id distinct semantics.
