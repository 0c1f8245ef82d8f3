"""SparkSession factory.

Tuned for the project's execution envelope: local[32] single-JVM for tests and
bench, but every setting is chosen to also hold on a 1000-executor cluster —
AQE on (runtime re-plan, skew-join splitting, partition coalescing), shuffle
partitions sized to cores rather than the 200 default, Arrow enabled for the
few Pandas-UDF paths, UTC session timezone so timestamp results are stable
across hosts and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_RUNTIME_CONF = {
    # AQE: runtime coalescing + skew-join handling; essential at 100 TB where
    # static partition counts are always wrong for some stage.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamp rendering (matches DuckDB's naive parquet read).
    "spark.sql.session.timeZone": "UTC",
    # The driver's older events.parquet ships TIMESTAMP(NANOS), which Spark
    # only reads with this flag (as int64 nanos; catalog.normalize_events_ts
    # converts). Declared session-wide HERE — not as a hidden side effect of
    # whichever table read happens first — so the posture is explicit: NANOS
    # parquet columns in this engine always arrive as int64 for explicit
    # normalization.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for toPandas / pandas_udf exchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Bigger Arrow batches for the chunked-write path: the default 10k rows
    # per batch makes applyInPandas reassemble a 1M-cell chunk from ~100
    # Python-side concats (measured 4.4x slower end-to-end). ~12 MB batches
    # at 24 B/row keep per-task memory trivial.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "500000",
    # let the mdio Python DataSource consume dim predicates for chunk pruning
    "spark.sql.python.filterPushdown.enabled": "true",
}


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if cpus.isdigit():
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "mdio-cpp-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's standard tuning."""
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an externally-created session.

    The verification driver hands us its own SparkSession; these are the
    settings we depend on for result determinism (timezone) and plan quality
    (AQE) that can still be set after the JVM is up.
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — ignore
    return spark
