"""Statistics operators — the ``statsV1`` contract of the reference.

Reference semantics (file:line in /root/reference):
  * ``SummaryStats`` — count/min/max/sum/sumSquares per variable
    (mdio/stats.h:229-335); float stats are *stored* as float but we compute
    in double and cast on serialize, matching the guidance in SURVEY §7 M2.
  * ``CenteredBinHistogram`` — binCenters[] + counts[] (mdio/stats.h:109-161).
  * ``EdgeDefinedHistogram`` — binEdges[] + binWidths[] + counts[]
    (mdio/stats.h:163-227).
  * ``Variable::num_samples`` — cell count (mdio/variable.h:1153-1162).
  * ``get_intervals`` — per-dimension [min, max) domain
    (mdio/variable.h:1652-1698, mdio/dataset.h:264-287).

All of these are single-pass partial aggregates: Spark computes map-side
partial min/max/sum/count per partition and merges — one shuffle of one row
per partition regardless of table size, which is exactly the 100 TB-safe
shape. Histograms group on a derived bin id, so cardinality of the shuffle is
#bins, not #rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summary_stats(df: DataFrame, col: str, round_to: int | None = 2) -> DataFrame:
    """A1: one-row DataFrame (cnt, min_v, max_v, sum_v, sum_sq)."""
    c = F.col(col).cast("double")
    sum_v, sum_sq = F.sum(c), F.sum(c * c)
    if round_to is not None:
        sum_v, sum_sq = F.round(sum_v, round_to), F.round(sum_sq, round_to)
    return df.agg(
        F.count(col).alias("cnt"),
        F.min(col).alias("min_v"),
        F.max(col).alias("max_v"),
        sum_v.alias("sum_v"),
        sum_sq.alias("sum_sq"),
    )


def centered_bin_histogram(df: DataFrame, col: str, bin_width: float, origin: float = 0.0) -> DataFrame:
    """A2: fixed-width histogram; bin center = origin + (i + 0.5) * width.
    Returns (bin, cnt) ordered by bin."""
    bin_id = F.floor((F.col(col) - F.lit(origin)) / F.lit(bin_width)).cast("int").alias("bin")
    return df.groupBy(bin_id).agg(F.count(F.lit(1)).alias("cnt")).orderBy("bin")


def edge_binned_histogram(df: DataFrame, col: str, edges: Sequence[float]) -> DataFrame:
    """A3: explicit-edge histogram, bins [e_i, e_{i+1}) half-open, values
    outside [e_0, e_last) dropped — matching EdgeDefinedHistogram's contract
    (stats.h:163-227). Returns (bin, lo, hi, cnt) ordered by bin."""
    if len(edges) < 2 or any(b <= a for a, b in zip(edges, edges[1:])):
        raise ValueError("edges must be strictly increasing with >= 2 entries")
    c = F.col(col)
    bin_expr = F.lit(None).cast("int")
    # Build a when-chain; Catalyst folds it into one codegen'd CASE.
    expr = None
    for i, (lo, hi) in enumerate(zip(edges, edges[1:])):
        cond = (c >= F.lit(lo)) & (c < F.lit(hi))
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    bin_expr = expr.otherwise(F.lit(None)).alias("bin")
    lo_arr = F.array(*[F.lit(float(e)) for e in edges[:-1]])
    hi_arr = F.array(*[F.lit(float(e)) for e in edges[1:]])
    return (
        df.select(bin_expr)
        .filter(F.col("bin").isNotNull())
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("lo", F.element_at(lo_arr, F.col("bin") + 1))
        .withColumn("hi", F.element_at(hi_arr, F.col("bin") + 1))
        .select("bin", "lo", "hi", "cnt")
        .orderBy("bin")
    )


def num_samples(df: DataFrame) -> DataFrame:
    """A4: cell count (variable.h:1153-1162)."""
    return df.agg(F.count(F.lit(1)).alias("n"))


def get_intervals(df: DataFrame, dims: Sequence[str]) -> DataFrame:
    """A5: per-dimension half-open [min, max+1) domain, one row per dim.
    Computed in a single pass over the table (one agg, all dims at once),
    then unpivoted — not one scan per dimension."""
    aggs = []
    for d in dims:
        aggs.append(F.min(d).alias(f"__lo_{d}"))
        aggs.append((F.max(d) + F.lit(1)).alias(f"__hi_{d}"))
    row = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(d).alias("dim"),
                F.col(f"__lo_{d}").cast("long").alias("lo"),
                F.col(f"__hi_{d}").cast("long").alias("hi"),
            )
            for d in dims
        ]
    )
    return (
        row.select(F.explode(structs).alias("iv"))
        .select("iv.dim", "iv.lo", "iv.hi")
        .orderBy("dim")
    )
