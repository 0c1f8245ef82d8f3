"""Registry plumbing for declared queries.

A declared query is the unit of the correctness gate: a named Spark plan
``fn(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the exact ANSI
SQL a DuckDB oracle runs on the same parquet tables. Column names AND types
must match between the two — every computed column is aliased identically on
both sides, doubles that depend on accumulation order are rounded, and
integer widths are cast to agree (Spark count/sum → BIGINT etc.).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Declared:
    name: str
    doc: str
    spark: SparkQuery
    oracle: str | None  # None → non-SQL-expressible; driver runs rows-only check


REGISTRY: dict[str, Declared] = {}


def declared(
    name: str,
    oracle: str | None = None,
    aliases: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Register a query under ``name``; ``aliases`` register the SAME plan
    and oracle under retired names so historical artifacts (CORRECTNESS_r*,
    SCALING.md rows) stay resolvable after a rename."""

    def deco(fn: SparkQuery) -> SparkQuery:
        for n in (name, *aliases):
            if n in REGISTRY:
                raise ValueError(f"duplicate declared query {n!r}")
            REGISTRY[n] = Declared(
                name=n, doc=(fn.__doc__ or "").strip(), spark=fn, oracle=oracle
            )
        return fn

    return deco
