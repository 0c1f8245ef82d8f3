"""Skew-mitigation operators: salted join and salted two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) handles most hot keys at
runtime, but it only splits SORT-MERGE join partitions; a broadcast-infeasible
join against a side with a handful of degenerate keys (the classic 100 TB
failure: one user/bucket holds 1% of all rows) can still need explicit
salting. These helpers implement the standard deterministic recipe:

  * ``salted_join``: the skewed (large) side gets a DETERMINISTIC salt
    ``pmod(hash(all cols), n)`` — no rand(), so plans stay reproducible and
    retries/speculative tasks agree; the small side is exploded n× with every
    salt value. The join key becomes (key, salt), splitting each hot key into
    n shuffle partitions at the cost of replicating the small side n times.
  * ``salted_agg_count``: two-phase aggregation (pre-aggregate on
    (key, salt), then final on key) — what Spark's partial aggregation
    already does for algebraic aggregates; provided explicitly for
    aggregates where the partial combine must be spelled out.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, cols: Sequence[str] | None = None) -> DataFrame:
    """Deterministic salt column in [0, n_salts): pmod(xxhash64(cols), n).
    Deterministic ⇒ identical across retries and across both phases of a
    two-phase aggregate."""
    basis_cols = df.columns if cols is None else list(cols)
    basis = [F.col(c) for c in basis_cols]
    if not basis:
        raise ValueError(
            "with_salt needs at least one column to hash — a frame whose "
            "columns are exactly the join keys cannot be salted "
            "deterministically (every copy of a key would get one salt)"
        )
    return df.withColumn("__salt", F.pmod(F.xxhash64(*basis), F.lit(n_salts)).cast("int"))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the small side exploded n×.

    Shuffle key = (join keys, salt): a key holding k rows lands in n_salts
    partitions of ~k/n rows each. Cost: small side replicated n_salts times
    (keep it the genuinely smaller input). Inner and left joins only: a
    right/full outer would surface each UNMATCHED small-side row once per
    salt copy (n_salts duplicates) — plain-join parity cannot hold."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins; how={how!r} would "
            "duplicate unmatched small-side rows once per salt copy"
        )
    keys = list(on)
    s = with_salt(skewed, n_salts, cols=[c for c in skewed.columns if c not in keys])
    r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return s.join(r, on=keys + ["__salt"], how=how).drop("__salt")


def salted_agg_count(df: DataFrame, keys: Sequence[str], n_salts: int = 8) -> DataFrame:
    """Two-phase count: groupBy(keys, salt) → groupBy(keys) sum. The first
    shuffle spreads each hot key across n_salts reducers; the second moves
    only n_salts rows per key."""
    keys = list(keys)
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("cnt"))
