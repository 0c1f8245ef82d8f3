"""Bilinear interpolation over a stored 2-D grid variable.

Reference parity: the reference ships bilinear interpolation as application
code over a read-back array (`/root/reference/examples/real_data_example/src/
interpolation.h:22` — BilinearInterpolation over inline/crossline fractional
coordinates). Spark-first re-expression: each target point explodes into its
four corner cells with closed-form weights, the corners equi-join against the
grid's long-form scan (the grid never materializes driver-side), and the
weighted sum reassembles per target.

Scale shape: the only shuffle is the corner equi-join on (row, col) — when
the target set is small it broadcasts and the (chunk-pruned) grid scan never
moves; when targets are large both sides hash-partition on the corner key.
The final combine is a partial agg keyed by target id. Determinism: each of
the four corner contributions lands in its own slot (k = 0..3) and the sum is
a fixed-order `p0 + p1 + p2 + p3` expression, so the result is bit-stable
across partitionings and engines (no unordered float accumulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bilinear_interp(
    grid: DataFrame,
    targets: DataFrame,
    id_col: str = "t",
    y_col: str = "ry",
    x_col: str = "cx",
    row_col: str = "row",
    col_col: str = "col",
    val_col: str = "v",
    broadcast_targets: bool = True,
) -> DataFrame:
    """Interpolate ``grid`` (long form: row, col, value) at fractional
    points ``targets`` (id, y, x). Returns (id, val) with val rounded to 4
    places. Corner cells must exist in ``grid`` (callers clamp/prune the
    target domain; out-of-domain corners would null the target's result).
    """
    y, x = F.col(y_col), F.col(x_col)
    r0 = F.floor(y).cast("long")
    c0 = F.floor(x).cast("long")
    fy = y - F.floor(y)
    fx = x - F.floor(x)
    one = F.lit(1.0)
    corners = F.array(
        F.struct(F.lit(0).alias("k"), r0.alias("r"), c0.alias("c"),
                 ((one - fy) * (one - fx)).alias("w")),
        F.struct(F.lit(1).alias("k"), r0.alias("r"), (c0 + 1).alias("c"),
                 ((one - fy) * fx).alias("w")),
        F.struct(F.lit(2).alias("k"), (r0 + 1).alias("r"), c0.alias("c"),
                 (fy * (one - fx)).alias("w")),
        F.struct(F.lit(3).alias("k"), (r0 + 1).alias("r"), (c0 + 1).alias("c"),
                 (fy * fx).alias("w")),
    )
    t = targets.select(F.col(id_col), F.explode(corners).alias("__c")).select(
        id_col,
        F.col("__c.k").alias("__k"),
        F.col("__c.r").alias(row_col),
        F.col("__c.c").alias(col_col),
        F.col("__c.w").alias("__w"),
    )
    if broadcast_targets:
        t = F.broadcast(t)
    joined = grid.join(t, on=[row_col, col_col])
    # one slot per corner: each max() aggregates a single non-null product,
    # so the final sum is the fixed-order 4-term expression, not an
    # unordered float reduction
    slots = [
        F.max(F.when(F.col("__k") == k, F.col("__w") * F.col(val_col))).alias(f"__p{k}")
        for k in range(4)
    ]
    agg = joined.groupBy(id_col).agg(*slots, F.sum("__w").alias("__wsum"))
    val = (
        F.coalesce(F.col("__p0"), F.lit(0.0))
        + F.coalesce(F.col("__p1"), F.lit(0.0))
        + F.coalesce(F.col("__p2"), F.lit(0.0))
        + F.coalesce(F.col("__p3"), F.lit(0.0))
    )
    # corner weights sum to 1 by construction, so a joined weight sum short
    # of 1 means a NONZERO-weight corner fell outside the grid — that
    # target's value is undefined (NULL), never a plausible partial sum.
    # (A missing zero-weight corner — integer coordinate on the last
    # row/col — leaves the sum at 1 and the result exact. Targets with no
    # surviving corner at all are absent from the output.)
    ok = F.abs(F.col("__wsum") - 1.0) < 1e-9
    return agg.select(
        id_col, F.when(ok, F.round(val, 4)).alias("val")
    )
