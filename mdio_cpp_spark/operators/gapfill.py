"""Gap filling over ordered series: LOCF/NOCB with an optional reach limit —
xarray ``ffill(dim, limit)`` / ``bfill(dim, limit)`` re-expressed with NO
global data window.

Scale design (the zarr24 prefix-sum shape, applied to carries):

  1. Rows bucket by ``index div bucket_size`` (for stored arrays the chunk
     size is the natural bucket — chunk-local work stays chunk-local).
  2. In-bucket carry: ``last(value, ignorenulls)`` (and the carried SOURCE
     index, for the limit) over a window partitioned by bucket — thousands
     of parallel partitions, never one.
  3. Cross-bucket carry: each bucket's last non-null (value, index) — ONE
     row per bucket — cumulates over a buckets-only window and joins back
     broadcast. That window is global but sees |buckets| rows, bounded by
     construction (the documented-bounded exception class).
  4. fill = coalesce(in-bucket, previous-bucket) — masked to NULL when the
     donor row is farther than ``limit`` positions away.

``direction='backward'`` (NOCB) mirrors the index axis (negation), reusing
the identical machinery — the same trick as the forward as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fill_gaps"]


def fill_gaps(
    df: DataFrame,
    index_col: str,
    value_col: str,
    bucket_size: int = 2048,
    direction: str = "forward",
    limit: int | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Fill NULL ``value_col`` cells from the nearest non-null row at or
    before (``forward``) / at or after (``backward``) each ``index_col``
    position, optionally only within ``limit`` positions. Returns the input
    columns with ``out_col`` (default: ``value_col`` replaced) filled.

    ``index_col`` must be integer-like and unique per row (a dimension
    index, a row number); donor distance for ``limit`` is measured in
    index units.
    """
    if direction not in ("forward", "backward"):
        raise ValueError(f"direction must be 'forward' or 'backward', got {direction!r}")
    if limit is not None and limit < 0:
        raise ValueError("limit must be >= 0")
    out_col = out_col or value_col
    keep_cols = [c for c in df.columns]

    idx = F.col(index_col).cast("long")
    if direction == "backward":
        idx = -idx  # mirrored axis: NOCB becomes LOCF
    work = df.withColumn("__gx", idx).withColumn(
        "__gb", F.floor(F.col("__gx") / F.lit(int(bucket_size)))
    )
    src = F.when(F.col(value_col).isNotNull(), F.struct(
        F.col("__gx").alias("x"), F.col(value_col).alias("v")
    ))
    work = work.withColumn("__gsrc", src)

    w_in = Window.partitionBy("__gb").orderBy("__gx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = work.withColumn(
        "__g_in", F.last("__gsrc", ignorenulls=True).over(w_in)
    )

    # one row per bucket: its last non-null (x, v); cumulated over strictly
    # earlier buckets (|buckets| rows — bounded by construction)
    b_last = work.groupBy("__gb").agg(F.max("__gsrc").alias("__g_last"))
    w_b = Window.orderBy("__gb").rowsBetween(Window.unboundedPreceding, -1)
    carry = b_last.select(
        "__gb", F.last("__g_last", ignorenulls=True).over(w_b).alias("__g_prev")
    )

    donor = F.coalesce(F.col("__g_in"), F.col("__g_prev"))
    filled = donor.getField("v")
    if limit is not None:
        filled = F.when(
            F.col("__gx") - donor.getField("x") <= F.lit(int(limit)), donor.getField("v")
        )
    # carry is one row per bucket — broadcast-sized for any store a single
    # query touches, but NOT forced: at ~12M chunks (100 TB) AQE falls back
    # to a shuffle join keyed on __gb, co-partitioned with the window above
    out = (
        carried.join(carry, "__gb", "left")
        .withColumn("__g_fill", F.coalesce(F.col(value_col), filled))
    )
    return out.select(
        *[F.col(c) for c in keep_cols if c != out_col],
        F.col("__g_fill").alias(out_col),
    )
