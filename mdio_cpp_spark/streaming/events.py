"""Structured Streaming transforms over the ``events`` table.

The reference has no streaming machinery (SURVEY §2.5) — its async
futures/promises (tensorstore::Future, /root/reference/mdio/variable.h:1079-1103)
are I/O concurrency, not stream semantics. This module is north-star surface.

Design rule: every transformation is written once as a pure
DataFrame→DataFrame function and applied to BOTH the batch table (for the
DuckDB oracle / bench) and a ``readStream`` source (for the streaming tests).
That guarantees batch/stream parity by construction — the same logical plan,
with watermarks only on the stream side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# events.parquet has shipped ts as TIMESTAMP(NANOS) (older driver rounds —
# Spark's parquet reader rejects nanos, so those read as long via nanosAsLong
# and convert) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (newer rounds —
# read directly as timestamp). stream_events_raw probes the file with one
# batch footer read and picks the right schema, the same normalization as
# the batch path (catalog.py), so batch and stream see identical values.
EVENTS_RAW_SCHEMA_NANOS = "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string"
EVENTS_RAW_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


def stream_events_raw(
    spark: SparkSession,
    path: str,
    glob_filter: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream events parquet with ts normalized to session-tz TIMESTAMP
    across both driver data formats. The probe is a driver-side footer read
    (schema only, no data scan)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read
    if glob_filter is not None:
        probe = probe.option("pathGlobFilter", glob_filter)
    nanos = dict(probe.parquet(path).dtypes).get("ts") == "bigint"
    reader = spark.readStream.schema(
        EVENTS_RAW_SCHEMA_NANOS if nanos else EVENTS_RAW_SCHEMA
    ).format("parquet")
    if glob_filter is not None:
        reader = reader.option("pathGlobFilter", glob_filter)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(path)
    from mdio_cpp_spark.catalog import normalize_events_ts

    return normalize_events_ts(raw, nanos)


def windowed_event_agg(events: DataFrame, window: str = "1 minute") -> DataFrame:
    """Tumbling-window count + sum per event type. Window starts align to
    the epoch, so for whole-minute windows ``window.start`` equals
    ``date_trunc('minute', ts)`` — the oracle's formulation."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n_events", "sum_value")
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_seconds``. Returns
    (event_id, user_id, session_seq) where session_seq is the user's 1-based
    session number.

    Batch formulation: lag + running sum over a per-user window (micросecond-
    exact gap arithmetic via unix_micros so the oracle matches exactly).
    Streaming formulation of the same semantics would use
    ``applyInPandasWithState`` / session windows (``F.session_window``).
    """
    w_order = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_order))
    is_new = F.when(gap_us.isNull() | (gap_us > F.lit(gap_seconds * 1_000_000)), 1).otherwise(0)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, 0)
    return events.select(
        "event_id",
        "user_id",
        F.sum(is_new).over(w_run).cast("long").alias("session_seq"),
    )


def interval_join(
    left: DataFrame, right: DataFrame, key: str, time_col: str, max_gap_seconds: int
) -> DataFrame:
    """Per-key interval join: each left event pairs with right events of the
    same key STRICTLY after it and within ``max_gap_seconds`` — the
    stream-stream join shape (watermarks on both sides bound the state the
    join must buffer; in batch it is an equi-join + range predicate, which
    Spark executes as a sort-merge join with the range as a post-filter).
    Microsecond-exact arithmetic so the DuckDB oracle matches bit-for-bit.

    Returns (left columns prefixed l_, right columns prefixed r_)."""
    lt = left.select(*[F.col(c).alias(f"l_{c}") for c in left.columns])
    rt = right.select(*[F.col(c).alias(f"r_{c}") for c in right.columns])
    gap = F.unix_micros(F.col(f"r_{time_col}")) - F.unix_micros(F.col(f"l_{time_col}"))
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (gap > 0)
        & (gap <= max_gap_seconds * 1_000_000)
    )
    return lt.join(rt, cond)


def dedup_events(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Exactly-once projection under at-least-once delivery: drop redelivered
    events by event_id. All copies of a redelivered event are byte-identical,
    so keep-any semantics is deterministic. On a stream, the watermark bounds
    the dedup state store — ids older than the watermark are evicted, which
    is the standard Kafka-replay dedup shape; in batch the same call is a
    hash aggregate on event_id.

    The streaming path keys on (event_id, ts): Spark only evicts dedup state
    when the event-time column is part of the dedup key, and redelivered
    copies carry the original ts, so adding it changes nothing semantically
    while keeping state bounded by the watermark."""
    if watermark is not None:
        return events.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])
    return events.dropDuplicates(["event_id"])


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based streaming source over the events parquet (one-shot with
    Trigger.availableNow in tests; identical shape to a Kafka source in prod)."""
    # the file stream source monitors a DIRECTORY; events.parquet is a single
    # file, so stream the parent dir with a glob filter
    return stream_events_raw(spark, sf_dir, glob_filter="events.parquet")


def stream_windowed_agg(spark: SparkSession, sf_dir: str, window: str = "1 minute") -> DataFrame:
    """Streaming twin of windowed_event_agg with a 10-minute watermark for
    late data; append-mode compatible."""
    src = stream_events(spark, sf_dir).withWatermark("ts", "10 minutes")
    return windowed_event_agg(src, window)


def type_reference_stats(events_batch: DataFrame) -> DataFrame:
    """Static reference table for stream enrichment: per-type exact mean
    value in integer-cents arithmetic (order-independent, engine-exact)."""
    return events_batch.groupBy("event_type").agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value_e2")
    )


def enrich_with_type_stats(events: DataFrame, type_stats: DataFrame) -> DataFrame:
    """Stream-static broadcast join: each (possibly streaming) event gains
    its type's reference mean and the deviation from it. In streaming this
    is the stateless enrich shape — the static side is planned once per
    micro-batch and broadcast, no state store involved."""
    return events.join(F.broadcast(type_stats), "event_type").select(
        "event_id",
        "event_type",
        (F.round(F.col("value") * 100).cast("double") - F.col("avg_value_e2")).alias("dev_e2"),
    )


def sliding_event_rate(events: DataFrame, window: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """SLIDING-window event counts per type (window length > hop → each
    event lands in length/hop windows). The one window shape the tumbling
    (windowed_event_agg) and session (sessionize) operators don't cover —
    rate monitors and SLO alerts want overlap so a burst can't straddle a
    boundary unseen. Same epoch-aligned ``F.window`` in batch and
    streaming; in streaming the state per key is length/hop open windows."""
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )


def stream_sliding_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_event_rate(stream_events(spark, sf_dir))


def ohlc_bars(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Windowed OHLC bars per event type — the tick→bar compaction as ONE
    windowed aggregate. Open/close are min_by/max_by over a composite
    STRUCT order key (ts, event_id): lexicographic struct comparison is a
    total order even under timestamp ties, and unlike a packed
    ms-epoch·10⁶ + event_id integer it stays correct when event_id ≥ 10⁶.
    These are DECLARATIVE aggregates — update-mergeable (value, key)
    pairs — so the identical expression runs batch and streaming;
    streaming state is one 4-number bar per open (window, type), never a
    buffer of ticks. Values ride integer cents; the /100.0 happens once
    per emitted bar."""
    k = F.struct(F.col("ts"), F.col("event_id"))
    vc = F.round(F.col("value") * 100).cast("long")
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.min_by(vc, k).alias("oc"),
            F.max(vc).alias("hc"),
            F.min(vc).alias("lc"),
            F.max_by(vc, k).alias("cc"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("ws"),
            "event_type",
            (F.col("oc").cast("double") / 100.0).alias("open"),
            (F.col("hc").cast("double") / 100.0).alias("high"),
            (F.col("lc").cast("double") / 100.0).alias("low"),
            (F.col("cc").cast("double") / 100.0).alias("close"),
            "n_events",
        )
    )


def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlc_bars(stream_events(spark, sf_dir))
