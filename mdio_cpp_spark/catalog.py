"""Test-table catalog: loaders for the driver-generated parquet tables.

Mirrors the reference's ``Dataset::Open`` catalog role (metadata read once on
the driver, per-variable lazy handles — /root/reference/mdio/dataset.h:941-963)
for the relational test substrate: schema inference happens once per
``spark.read.parquet`` and every downstream query is a lazy plan against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. Column pruning + predicate pushdown reach the
    parquet scan because the read is declarative (no collect here)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet has shipped ts as TIMESTAMP(NANOS) (older driver
        # rounds) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (newer rounds).
        # Normalize both to session-tz TIMESTAMP (session tz is UTC, so the
        # NTZ cast is value-preserving and matches DuckDB's naive reading).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        nanos = df.schema["ts"].dataType.simpleString() == "bigint"
        return normalize_events_ts(df, nanos)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_events_ts(df: DataFrame, nanos: bool) -> DataFrame:
    """ts → session-tz TIMESTAMP for both driver data formats (nanos-as-long
    legacy, and MICROS NTZ). Shared by the batch catalog and the streaming
    source so the two normalizations cannot drift. NOTE: reading the nanos
    format at all requires spark.sql.legacy.parquet.nanosAsLong=true, which
    callers set session-wide before the read (the flag only affects parquet
    columns of the deprecated TIMESTAMP(NANOS) physical type)."""
    if nanos:
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
