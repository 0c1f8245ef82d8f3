"""Structured Streaming parity: the stream path (readStream + watermark +
Trigger.availableNow) must produce exactly the batch twin's result — the
design rule in streaming/events.py (one pure transformation applied to both
sources)."""

from __future__ import annotations

import tempfile

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.streaming.events import stream_windowed_agg, windowed_event_agg


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
