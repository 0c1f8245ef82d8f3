"""Sampling and sequence-packing operators for training-data pipelines.

North-star extension work (no reference analog — the reference is an array
store; these are the corpus-curation stages a 100 TB text pipeline runs
between dedup and training):

  * stratified_hash_sample — DETERMINISTIC per-stratum downsampling by a
    content-stable hash of the id. Unlike ``df.sample`` (seeded RNG over
    partition layout), the keep/drop decision is a pure function of the row,
    so it is reproducible across cluster sizes, partitionings, and engines —
    which is also what makes it oracle-checkable in SQL.
  * sequence_packing — assign documents to fixed-token-budget packs (the
    "sequence packing" step before LLM training). Deterministic shard-local
    greedy: shard by id-hash, order by id within shard, running token total,
    pack = floor(start_offset / budget). Every stage is a partitioned
    window — no global sort, no single-partition stage; shards are
    independent exactly like the downstream data-loader workers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def hash_fraction(id_col: Column) -> Column:
    """Stable uniform-ish value in [0, 4096) from the first 3 md5 hex digits
    of the id string — enough resolution for per-mille sampling rates and
    cheap to mirror in any engine with md5."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 3), 16, 10).cast("long")


def stratified_hash_sample(
    df: DataFrame, id_col: str, stratum_col: str, rates: dict[str, float], default_rate: float = 1.0
) -> DataFrame:
    """Keep each row iff hash_fraction(id) < rate(stratum) * 4096.

    ``rates`` maps stratum value → keep probability. Pure map-side filter —
    no shuffle, no RNG state, no driver involvement; rebalancing a corpus by
    language/source at 100 TB is a single scan."""
    frac = hash_fraction(F.col(id_col))
    rate: Column = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(frac < (rate * 4096.0))


def fixed_size_hash_sample(df: DataFrame, id_col: str, stratum_col: str, k: int) -> DataFrame:
    """Deterministic fixed-SIZE per-stratum sample (derandomized reservoir
    sampling): rank rows within each stratum by md5(id) and keep the first
    ``k``. Where ``stratified_hash_sample`` fixes the keep *rate*, this fixes
    the output *count* — the eval-set / few-shot-pool primitive.

    One partitioned window (hash-partitioned by stratum, never global); the
    md5 order is a pure function of the row, so the selected set is identical
    across partitionings, cluster sizes, and engines. Adds ``smp_rank``
    (1-based position in md5 order within the stratum)."""
    w = Window.partitionBy(stratum_col).orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    return (
        df.withColumn("smp_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("smp_rank") <= k)
    )


def sequence_packing(
    df: DataFrame,
    id_col: str,
    token_count_col: Column,
    budget: int,
    n_shards: int = 16,
) -> DataFrame:
    """Assign each document a (shard, pack_id, start_off) under a fixed token
    budget per pack.

    Shard-local greedy in id order: pack_id = floor(cumulative-start / budget)
    — a document beginning before a budget boundary stays in that pack (the
    streaming-packing convention; oversize docs spill past the boundary and
    the next doc starts a new pack). Windows partition by shard, so
    parallelism = n_shards regardless of corpus size; at 100 TB you set
    n_shards to the data-loader's file-shard count."""
    shard = F.pmod(F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10).cast("long"),
                   F.lit(n_shards)).alias("shard")
    base = df.select(F.col(id_col), shard, token_count_col.alias("n_tok"))
    w = Window.partitionBy("shard").orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("start_off")
    return base.select(
        id_col, "shard", "n_tok", start
    ).withColumn("pack_id", F.expr(f"start_off div {int(budget)}"))


def hash_split(
    df: DataFrame, id_col: str, cut: float = 0.9, left: str = "train", right: str = "val"
) -> DataFrame:
    """Deterministic train/validation split: row goes to ``left`` iff
    hash_fraction(id) < cut * 4096. A pure map-side column — reproducible
    across partitionings, cluster sizes, and engines (same md5 formula as
    stratified_hash_sample), which is what makes a split auditable: any
    engine can recompute membership from the id alone. Adds ``split``."""
    return df.withColumn(
        "split",
        F.when(hash_fraction(F.col(id_col)) < F.lit(cut * 4096.0), F.lit(left)).otherwise(
            F.lit(right)
        ),
    )


def temperature_rates(
    df: DataFrame, stratum_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-stratum keep rates for temperature resampling: rate =
    (n_min / n)^(1-alpha), so the smallest stratum keeps everything and
    larger strata are progressively downsampled — the multilingual-corpus
    rebalancing rule (sampling probability ∝ n^alpha, normalized to the
    smallest stratum instead of the sum). Normalizing by MIN rather than the
    sum keeps the rate a correctly-rounded IEEE function of two exact
    integers (sqrt/pow of one quotient) — deterministic across engines and
    partitionings, with no order-sensitive float accumulation.

    Returns (stratum, n_orig, rate). One partial agg over the stratum key +
    a broadcast of the one-row global min. NULL strata (untagged rows) are
    excluded — they get no rate row and must not set n_min (a tiny
    untagged group would otherwise inflate every real stratum's
    downsampling)."""
    c = (
        df.where(F.col(stratum_col).isNotNull())
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("n_orig"))
    )
    m = c.agg(F.min("n_orig").alias("__nmin"))
    ratio = F.col("__nmin").cast("double") / F.col("n_orig").cast("double")
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    return c.join(F.broadcast(m)).select(
        stratum_col, "n_orig", rate.alias("rate")
    )


def temperature_resample(
    df: DataFrame, id_col: str, stratum_col: str, alpha: float = 0.5
) -> DataFrame:
    """Deterministically downsample over-represented strata to temperature
    ``alpha`` (alpha=1 keeps natural proportions, alpha→0 flattens): keep a
    row iff hash_fraction(id) < rate(stratum) * 4096, with rates from
    ``temperature_rates``. Map-side filter after a broadcast join of the
    tiny rate table — the 100 TB corpus never shuffles. NULL-stratum
    (untagged) rows pass through at rate 1: an inner join on the stratum
    would silently delete them (NULL never equi-joins), and they carry no
    rate row."""
    rates = temperature_rates(df, stratum_col, alpha)
    tagged = df.where(F.col(stratum_col).isNotNull())
    kept = tagged.join(
        F.broadcast(rates.select(stratum_col, "rate")), on=stratum_col
    ).filter(hash_fraction(F.col(id_col)) < F.col("rate") * 4096.0)
    untagged = df.where(F.col(stratum_col).isNull())
    return kept.drop("rate").unionByName(untagged)


def systematic_weighted_sample(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    stride: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Weighted sampling without RNG: walk the corpus in a deterministic
    order accumulating integer weights, keep each row that crosses a
    ``stride`` boundary of the running total — selection probability is
    proportional to weight (a row of weight w covers w/stride boundaries on
    average), the expected sample size is total_weight/stride, and the
    result is exactly reproducible on any engine (pure integer prefix
    arithmetic; the A-ES exponential-keys scheme would hinge on pow()
    ulp-parity across engines). The prefix sum runs in a window partitioned
    by ``partition_col`` (parallel across partitions; a global walk would
    be a single reducer — pass a sharding column at scale, as p01's packing
    does)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(partition_col) if partition_col is not None
        else Window.partitionBy(F.lit(0))
    ).orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(F.col(weight_col)).over(w)
    return (
        df.withColumn("__cum", cum)
        .filter(
            F.floor((F.col("__cum") - F.col(weight_col)) / F.lit(stride))
            != F.floor(F.col("__cum") / F.lit(stride))
        )
        .drop("__cum")
    )
