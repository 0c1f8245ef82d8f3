"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (broadcast-join revenue rollup) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose every declared query from
mdio_cpp_spark.plans — one entry per implemented operator from SURVEY.md §2
plus the north-star pipeline operators.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from mdio_cpp_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["j01_broadcast_join_agg"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: d.spark for name, d in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: d.oracle for name, d in sorted(REGISTRY.items()) if d.oracle is not None}
