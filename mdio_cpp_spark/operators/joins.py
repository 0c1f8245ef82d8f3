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
    how: str = "inner",
    bucket_seconds: int = 86_400,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the values from the latest right row
    with ``right_ts <= left_ts`` (inclusive), optionally per partition key.
    ``direction='forward'`` mirrors time (pandas ``merge_asof`` forward):
    the EARLIEST right row with ``right_ts >= left_ts`` — implemented by
    negating the microsecond axis, so the whole bucketed machinery below is
    shared and the plan is identical.

    Semantics match DuckDB/standard ASOF JOIN: ``how='inner'`` (default)
    drops left rows with no prior right row; ``how='left'`` keeps them with
    NULL values. All carried values come from the SAME right row (they are
    carried as one struct, never per-column).

    Scale design — no single-partition window, even keyless:

      1. Tag and union both sides; assign each row a coarse time bucket
         ``floor(ts / bucket_seconds)``.
      2. In-bucket carry: window partitioned by (keys, bucket) — thousands
         of parallel partitions instead of one. Right rows order before left
         rows at equal timestamps (inclusive match).
      3. Cross-bucket carry: the latest right struct per (keys, bucket) —
         a tiny aggregate, |buckets| rows — is cumulated over a
         buckets-only window (rowsBetween up to -1 → strictly earlier
         buckets) and joined back on (keys, bucket). That window sees one
         row per bucket, so even the keyless case is trivially small.
      4. Result = coalesce(in-bucket carry, previous-bucket carry).

    Cost: one full shuffle of left ∪ right on (keys, bucket) + one tiny
    boundary shuffle — the distributed as-of at its minimum data movement.
    """
    keys = list(partition_keys)
    lcols = [c for c in left.columns]
    rv_struct = F.struct(*[F.col(v) for v in value_cols])
    rv_type = "struct<" + ",".join(
        f"{v}:{right.schema[v].dataType.simpleString()}" for v in value_cols
    ) + ">"
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rv_struct.alias("__rv"),
    )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    us = F.unix_micros(F.col("__ts").cast("timestamp"))
    if direction == "forward":
        us = -us  # mirrored axis: 'latest prior' becomes 'earliest subsequent'
    u = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__us", us)
        .withColumn("__b", F.floor(F.col("__us") / F.lit(bucket_seconds * 1_000_000)))
    )

    # 2. in-bucket carry (parallel across buckets; deterministic tie-break on
    #    the value struct itself for equal (ts, side))
    w_in = (
        Window.partitionBy(*keys, "__b")
        .orderBy(F.col("__us").asc(), F.col("__side").asc(), F.col("__rv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *lcols, "__side", "__b",
        F.last("__rv", ignorenulls=True).over(w_in).alias("__rv_in"),
    )

    # 3. boundary table: latest right struct per bucket, cumulated across
    #    strictly-earlier buckets (|buckets| rows — tiny by construction)
    buckets = u.select(*keys, "__b").distinct()
    b_last = (
        u.filter(F.col("__side") == 0)
        .groupBy(*keys, "__b")
        .agg(F.max_by("__rv", F.struct(F.col("__us"), F.col("__rv"))).alias("__rv_last"))
    )
    w_b = Window.partitionBy(*keys).orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        buckets.join(b_last, on=keys + ["__b"], how="left")
        .select(*keys, "__b", F.last("__rv_last", ignorenulls=True).over(w_b).alias("__rv_prev"))
    )

    # 4. merge; the big side is already hash-partitioned by (keys, __b) from
    #    the window, so AQE reuses the exchange; carry side is tiny
    out = (
        carried.filter(F.col("__side") == 1)
        .join(carry, on=keys + ["__b"], how="left")
        .withColumn("__rv_final", F.coalesce(F.col("__rv_in"), F.col("__rv_prev")))
    )
    if how == "inner":
        out = out.filter(F.col("__rv_final").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.select(
        *lcols,
        *[F.col("__rv_final").getField(v).alias(v) for v in value_cols],
    )
