"""Similarity search over an embedding column (array<float>).

North-star extension (BASELINE.json): approximate-nearest-neighbor search.

  * ``cosine_topk`` — the exact baseline: broadcast the (small) query set
    against the partitioned corpus, compute cosine JVM-side, and take top-k
    per query with a window. The corpus never shuffles: the only shuffle is
    the final per-query top-k over (queries × k·partitions) candidate rows.
  * ``lsh_topk`` — the scale path: sign-LSH bucket both sides with
    deterministic hyperplanes and rank only within matching buckets, turning
    the corpus×queries product into an equi-join. Recall is tunable via
    n_planes (fewer planes → bigger buckets → higher recall, more compute).
    An IVF variant (k-means coarse quantizer) slots into the same shape with
    buckets = nearest-centroid ids.

Determinism contract for the oracle: cosines are computed in double with a
fixed evaluation order, rounded to 4 places *before* ranking, and ties broken
by candidate id — so Spark and DuckDB rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mdio_cpp_spark.functions import vectors
from mdio_cpp_spark.operators.dedup import sign_lsh_bucket


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        pairs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "cos", "rk")
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 5) -> DataFrame:
    """Exact brute-force top-k by cosine. ``queries`` is broadcast; corpus
    stays partitioned. Self-matches (same id) excluded."""
    q = F.broadcast(queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    pairs = (
        c.join(q, F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", F.round(vectors.cosine(F.col("qv"), F.col("cv")), 4).alias("cos"))
    )
    return _ranked(pairs, k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket, then exact cosine rank within the bucket."""
    bucket = sign_lsh_bucket(F.col(vec_col), dim, n_planes)
    q = F.broadcast(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"), bucket.alias("bk"))
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"), bucket.alias("bk"))
    pairs = (
        c.join(q, on="bk")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", F.round(vectors.cosine(F.col("qv"), F.col("cv")), 4).alias("cos"))
    )
    return _ranked(pairs, k)
