"""Equivalence gate for the round-11 lloyd_train rewrite: the map-side
centroid-literal argmax (``_cell_argmax_sql``) must assign every vector to
the SAME cell as the broadcast-join form (``ivf_assign``) it replaced —
including cosine ties (resolved to the larger cid), zero vectors (NULL
cosine) and negative components — and the full training trajectory must
match the old per-iteration ivf_assign composition exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.operators import similarity
from mdio_cpp_spark.operators.similarity import _cell_argmax_sql


def _assign_via_sql(df, vec_col, cents):
    vn, cell = _cell_argmax_sql(sorted(cents.items()), vec_col)
    return (
        df.selectExpr("id", vec_col, f"{vn} AS __vn")
        .selectExpr("id", f"{cell} AS cell")
    )


def test_cell_argmax_sql_matches_ivf_assign(spark):
    # hand-built corpus: axis vectors, a tie vector equidistant from two
    # centroids (cosine ties -> larger cid must win in BOTH forms), a zero
    # vector (NULL cosine everywhere), and negatives
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [1.0, 1.0, 0.0]),  # exact cosine tie between cents 0 and 1
        (3, [0.0, 0.0, 0.0]),  # zero vector: cosine NULL for every centroid
        (4, [-1.0, -1.0, 3.0]),
        (5, [0.3, 0.2, 0.1]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    cents = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.0, 0.0, 1.0]}
    cdf = spark.createDataFrame(
        sorted(cents.items()), "cid long, cv array<double>"
    )
    want = {
        r["id"]: r["cell"]
        for r in similarity.ivf_assign(df, "id", "v", cdf).collect()
    }
    got = {r["id"]: r["cell"] for r in _assign_via_sql(df, "v", cents).collect()}
    assert got == want
    assert want[2] == 1  # the tie really exercised the larger-cid break


def test_lloyd_train_matches_ivf_assign_composition(spark, sf_dir):
    """Replay the OLD lloyd_train (per-iteration ivf_assign + same quantized
    recentering) and require the new one-exchange form to produce the
    identical centroid trajectory on real embeddings."""
    e = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", "embedding")
    )
    k, iters = 4, 2

    exemplars = (
        e.orderBy("vec_id").limit(k)
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    )
    cents = {int(r[0]): [float(x) for x in r[1]] for r in exemplars}
    for _ in range(iters):
        cdf = spark.createDataFrame(
            sorted(cents.items()), "cid long, cv array<double>"
        )
        assigned = similarity.ivf_assign(e, "vec_id", "embedding", cdf)
        rows = (
            assigned.select(
                "cell",
                F.posexplode(F.col("embedding").cast("array<double>")).alias(
                    "d", "x"
                ),
            )
            .groupBy("cell", "d")
            .agg(
                F.sum(F.round(F.col("x") * 1e6).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        means: dict[int, dict[int, float]] = {}
        for r in rows:
            means.setdefault(int(r["cell"]), {})[int(r["d"])] = (
                float(r["s"]) / (float(r["n"]) * 1e6)
            )
        cents = {
            c: [means.get(c, {}).get(d, prev[d]) for d in range(len(prev))]
            for c, prev in cents.items()
        }
    want = sorted(cents.items())

    got = similarity.lloyd_train(e, "vec_id", "embedding", k=k, iters=iters)
    assert got == want
