"""Join operators.

The reference has no joins (SURVEY §2.5) — the one join-like construct is
implicit dimension alignment of variables sharing labels
(/root/reference/mdio/dataset.h:439-447 merges per-label domains), which in
relational form is an equi-join on the shared dimension columns. Everything
else here is north-star surface: broadcast/semi/anti joins and an as-of join
(the reference's ``sel`` is exact-match only — dataset.h:840-847 — so as-of is
a strict extension).

Scale notes baked into each operator:
  * ``dim_align_join`` broadcasts the small side when told to — a dimension
    table at 100 TB scale is still KBs–MBs, so the join should never shuffle
    the fact table.
  * ``asof_join`` uses the union + ordered-window formulation: one shuffle of
    (left ∪ right) range-partitioned on (keys, time) — no N×M cross product,
    no per-row subquery. With partition keys it parallelizes per key; AQE
    skew-split handles hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dim_align_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Variable-alignment join on shared dimension columns
    (dataset.h:439-447 analog). ``broadcast_dim`` forces a broadcast-hash
    join so the fact side never shuffles."""
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """EXISTS — rows of ``left`` with a match in ``right``."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """NOT EXISTS — rows of ``left`` without a match in ``right``."""
    return left.join(right, on=on, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    partition_keys: Sequence[str] = (),
) -> DataFrame:
    """As-of join: for each left row, the values from the latest right row
    with ``right_ts <= left_ts`` (inclusive), optionally per partition key.

    Implementation: tag and union both sides, sort by (keys, ts, side) with
    the right side ordered first at equal timestamps (inclusive match), then
    ``last(value, ignorenulls=True)`` over an unbounded-preceding window
    carries the most recent right values forward onto left rows. One shuffle,
    linear work — the standard distributed as-of formulation.
    """
    keys = list(partition_keys)
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}") for v in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *lcols,
        F.col("__side"),
        *[F.last(f"__v_{v}", ignorenulls=True).over(w).alias(v) for v in value_cols],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
