"""Deduplication operators over a documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

The reference has no dedup surface; this is north-star extension work
(BASELINE.json). Every operator is expressed with built-in functions only and
has an exact DuckDB oracle in ``plans/pipeline.py``.

Scale design (the point of each algorithm at 100 TB):
  * exact — one hash-groupBy; shuffle key is the content hash, so the shuffle
    carries (hash, id) pairs, not document bodies.
  * MinHash+LSH — signatures are computed map-side per document (no shuffle),
    then ONLY (band_id, band_hash, doc_id) tuples shuffle; candidate pairs
    come from an equi-join on (band, hash) buckets instead of an O(n²) cross
    product. Banding (b bands × r rows) tunes the similarity threshold
    ≈ (1/b)^(1/r).
  * SimHash — per-document bit signature, map-side only; near-dup = signature
    (or band-of-bits) equality, again an equi-join.
  * n-gram Jaccard — the *verify* step on candidate pairs (never run on the
    full cross product).
  * embedding near-dup — sign-LSH buckets from deterministic hyperplanes,
    exact cosine verification only within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mdio_cpp_spark.functions import hashing, text, vectors


def exact_dedup_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact duplicate groups by content hash: (h, keep_id, dup_cnt).
    keep_id = min id in the group (the canonical survivor)."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("h"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct content value."""
    w_keep = exact_dedup_groups(df, id_col, content_col).select("keep_id")
    return df.join(w_keep, df[id_col] == F.col("keep_id"), "left_semi")


def minhash_signature_cols(text_col: Column, num_hashes: int, shingle_n: int = 3) -> list[Column]:
    """MinHash signature as ``num_hashes`` columns (mh0..mh{k-1}), computed
    from distinct word shingles. Map-side only."""
    sh = F.array_distinct(text.word_shingles(text.tokens(text_col), shingle_n))
    return [hashing.minhash(sh, j).alias(f"mh{j}") for j in range(num_hashes)]


def minhash_bands(df: DataFrame, id_col: str, text_col: str, bands: int, rows: int, shingle_n: int = 3) -> DataFrame:
    """(id, band, bh) — one row per LSH band; bh = md5 of the concatenated
    band slice of the signature. Docs with < shingle_n tokens are dropped."""
    k = bands * rows
    toks = text.tokens(text_col)
    sig = df.filter(F.size(toks) >= shingle_n).select(
        F.col(id_col), *minhash_signature_cols(F.col(text_col), k, shingle_n)
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(band_structs).alias("e")).select(
        id_col, F.col("e.band").alias("band"), F.col("e.bh").alias("bh")
    )


def lsh_candidate_pairs(df: DataFrame, id_col: str, text_col: str, bands: int = 4, rows: int = 4) -> DataFrame:
    """Distinct candidate near-dup pairs (doc_a < doc_b) via MinHash banding.
    The join key is (band, bh): only same-bucket docs ever meet."""
    b = minhash_bands(df, id_col, text_col, bands, rows)
    a = b.select(F.col(id_col).alias("doc_a"), "band", "bh")
    c = b.select(F.col(id_col).alias("doc_b"), "band", "bh")
    return (
        a.join(c, on=["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_bits(df: DataFrame, id_col: str, text_col: str, n_bits: int = 16) -> DataFrame:
    """Long-form SimHash: (id, pos, bit) for pos in 1..n_bits.

    bit_p = sign of Σ_tokens (±1), where a token votes +1 on position p iff
    the p-th hex digit of md5(token) has its high bit set (digit >= '8').
    Frequency-weighted (every occurrence votes). Map-side explode + one
    groupBy on (id, pos) — shuffle carries counts, not text.
    """
    toks = df.select(F.col(id_col), F.explode(text.tokens(text_col)).alias("tok"))
    votes = toks.select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.lit(n_bits))).alias("pos"),
        F.col("tok"),
    ).select(
        id_col,
        "pos",
        F.when(F.substring(F.md5("tok"), F.col("pos"), 1) >= F.lit("8"), 1).otherwise(-1).alias("c"),
    )
    return (
        votes.groupBy(id_col, "pos")
        .agg(F.sum("c").alias("s"))
        .select(id_col, "pos", F.when(F.col("s") > 0, 1).otherwise(0).alias("bit"))
    )


def ngram_jaccard(left_sh: Column, right_sh: Column) -> Column:
    """Jaccard similarity of two distinct-shingle arrays (double)."""
    inter = F.size(F.array_intersect(left_sh, right_sh))
    union = F.size(F.array_union(left_sh, right_sh))
    return inter / union


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine: sign-LSH bucket (equi-join)
    then exact cosine >= threshold within buckets. Returns
    (doc_a, doc_b, cos) with cos rounded to 4 places."""
    bucket = sign_lsh_bucket(F.col(vec_col), dim, n_planes)
    b = df.select(F.col(id_col), F.col(vec_col), bucket.alias("bk"))
    a = b.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"), "bk")
    c = b.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"), "bk")
    cos = F.round(vectors.cosine(F.col("va"), F.col("vb")), 4)
    return (
        a.join(c, on="bk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", cos.alias("cos"))
        .filter(F.col("cos") >= F.lit(threshold))
    )


def sign_lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-LSH bucket id: concatenated sign bits of projections onto
    deterministic ±1 hyperplanes (functions.hashing.hyperplane_weights)."""
    planes = hashing.hyperplane_weights(n_planes, dim)
    bits = []
    for row in planes:
        w = F.array(*[F.lit(x) for x in row])
        proj = vectors.dot(vec, w)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)
