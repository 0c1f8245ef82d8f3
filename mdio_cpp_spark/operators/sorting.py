"""Sorting / top-k operators.

Reference semantics (file:line in /root/reference):
  * ``CoordinateSelector::sortSelectionByKey`` — stable sort by a key
    variable; chained calls build a multi-key sort least-significant-key
    first (std::stable_sort, mdio/coordinate_selector.h:122-188).
  * peak/trough tracking — running argmax of a value with coordinate lookup
    (examples/seismic_reader/main.cc:71-127).

Spark's ``orderBy`` is a range-partitioned distributed sort (sample → range
boundaries → shuffle → per-partition sort), so a multi-key sort is one pass
listing all keys most-significant first — equivalent to the reference's
chained least-significant-first stable sorts. Top-k avoids the global sort
entirely: Catalyst plans ``TakeOrderedAndProject`` (per-partition heap + merge
of k·P candidates), which at 100 TB is the difference between shuffling the
table and shuffling k rows per partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sort_by_keys(df: DataFrame, keys: Sequence[str | Column], ascending: bool = True) -> DataFrame:
    """Multi-key sort (S0). ``keys`` are most-significant first, matching
    the *net effect* of the reference's chained least-significant-first
    stable sorts (coordinate_selector.h:162-166)."""
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    if not ascending:
        cols = [c.desc() for c in cols]
    return df.orderBy(*cols)


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Top-k by explicit ordering (S2). ``orderBy().limit(k)`` lets Catalyst
    plan TakeOrderedAndProject — no global sort materialized."""
    return df.orderBy(*order).limit(k)


def argmax(df: DataFrame, value_col: str, tiebreak: Sequence[str], out_cols: Sequence[str]) -> DataFrame:
    """Coordinate-of-the-maximum (seismic_reader's peak tracking): returns the
    ``out_cols`` of the single row maximizing ``value_col``, ties broken by
    ``tiebreak`` ascending — deterministic, unlike a bare max_by."""
    order = [F.col(value_col).desc(), *[F.col(t).asc() for t in tiebreak]]
    return df.orderBy(*order).limit(1).select(*out_cols)


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    n_salts: int = 32,
    salt_on: str | None = None,
) -> DataFrame:
    """Top-k rows per group WITHOUT a group-partitioned window over the data.

    The textbook ``row_number() OVER (PARTITION BY group)`` puts every row of
    a group in one window partition — with few/hot groups (the common case:
    top-3 per segment, per language, per event type) that is a handful of
    reducers sorting the whole table. Two bounded stages instead:

      1. per (group, salt) top-k: windows over ``n_salts`` sub-partitions per
         group, each holding ~1/n_salts of the group — parallelism =
         groups × n_salts at any size. The salt is a deterministic hash,
         never RNG state: of ``salt_on`` when given, else of ALL non-group
         columns together (maximal cardinality — a single low-cardinality
         default column could silently collapse the salting).
      2. global per-group top-k over the ≤ groups·n_salts·k survivors — a
         tiny frame, its window is safe by construction.

    A row in the true top-k is in its salt bucket's top-k, so stage 1 never
    discards a winner. Output columns: ``df``'s plus ``rk`` (1-based rank,
    deterministic under the given ``order`` — include tie-breaks for a total
    order, same contract as the reference's stable sort chain,
    coordinate_selector.h:122-188)."""
    if salt_on is None:
        # group columns hash constant within their group (which would
        # collapse the salting into exactly the hot-group window this
        # operator avoids); hash every other column together so no single
        # low-cardinality column can defeat the spread
        basis = [F.col(c) for c in df.columns if c not in set(group_cols)]
        if not basis:
            raise ValueError("topk_per_group needs a non-group column to salt on")
    else:
        basis = [F.col(salt_on)]
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*basis), F.lit(n_salts)))
    from pyspark.sql import Window

    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1", "__salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
    )
