"""Recall measurement for the approximate-similarity family: the ANN
variants trade recall for bucket-bounded compute — quantify the trade
against the exact baseline on the real embeddings table (deterministic
data + deterministic hyperplanes → exact, reproducible recalls)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.operators import similarity

K = 5
N_QUERIES = 20


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def test_ann_recall_ladder(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    dim = 64

    # the synthetic embeddings are near-uniform random, the hardest case for
    # sign-LSH (true neighbors sit barely above the noise floor) — 2 planes /
    # 3 probes is the operating point that keeps recall useful there; real
    # clustered embeddings support many more planes (smaller buckets)
    exact = _topk_sets(similarity.cosine_topk(e, q, "vec_id", "embedding", k=K))
    lsh = _topk_sets(similarity.lsh_topk(e, q, "vec_id", "embedding", dim=dim, k=K, n_planes=2))
    multi = _topk_sets(
        similarity.lsh_topk_multiprobe(
            e, q, "vec_id", "embedding", dim=dim, k=K, n_planes=2, n_probes=3
        )
    )

    def recall(approx):
        hits = sum(len(approx.get(qid, set()) & ex) for qid, ex in exact.items())
        return hits / sum(len(ex) for ex in exact.values())

    ivf1 = _topk_sets(similarity.ivf_topk(e, q, "vec_id", "embedding", k=K, n_cells=8))
    ivf2 = _topk_sets(
        similarity.ivf_topk_multiprobe(e, q, "vec_id", "embedding", k=K, n_cells=8, n_probes=2)
    )

    r_lsh, r_multi = recall(lsh), recall(multi)
    # multi-probe searches a superset of buckets → recall can only improve
    assert r_multi >= r_lsh
    # IVF: probing a second cell can only widen each query's searched set
    r_ivf1, r_ivf2 = recall(ivf1), recall(ivf2)
    assert r_ivf2 >= r_ivf1
    assert r_ivf2 >= 0.25, f"2-probe IVF recall collapsed: {r_ivf2:.2f}"
    # floors: generous, deterministic (fixed data, fixed hyperplanes) —
    # they document the trade rather than tune it
    assert r_lsh >= 0.15, f"single-probe recall collapsed: {r_lsh:.2f}"  # measured 0.40 (sf0.001) / 0.20 (sf0.01)
    assert r_multi >= 0.50, f"multi-probe recall collapsed: {r_multi:.2f}"  # measured 0.87 (sf0.001) / 0.72 (sf0.01)
    # and the approximations must never exceed exact (sanity)
    assert r_multi <= 1.0 and r_lsh <= 1.0


def test_adaptive_n_planes_bounds():
    """The density rule keeps EXPECTED bucket population in
    (TARGET/2, TARGET] whenever the clamp isn't active: smallest n in
    [5, 20] with 2^n * 16 >= N — so in-bucket pair work stays ~constant
    under corpus growth instead of quadratically densifying (round-5
    verdict, v05)."""
    from mdio_cpp_spark.operators.similarity import (
        _ADAPT_MAX_PLANES,
        _ADAPT_MIN_PLANES,
        _ADAPT_TARGET,
        adaptive_n_planes,
    )

    for n_rows in [0, 1, 499, 500, 512 * 16, 512 * 16 + 1, 2_000, 200_000,
                   5_000_000, 10**9]:
        n = adaptive_n_planes(n_rows)
        assert _ADAPT_MIN_PLANES <= n <= _ADAPT_MAX_PLANES
        if n < _ADAPT_MAX_PLANES:
            assert (1 << n) * _ADAPT_TARGET >= n_rows  # bucket target held
        if n > _ADAPT_MIN_PLANES:
            # minimality: one fewer plane would overfill the buckets
            assert (1 << (n - 1)) * _ADAPT_TARGET < n_rows
    # the fixture sizes the gates pin: sf0.01 (N=500) stays at 5 planes
    # (hash-stable with rounds 1-5); sf0.1 (N=2000) moves to 7
    assert adaptive_n_planes(500) == 5
    assert adaptive_n_planes(2000) == 7


def test_knn_join_adaptive_equals_explicit(spark):
    """n_planes=None must equal an explicit adaptive_n_planes(N) call —
    the count probe only selects the plane family, never the math."""
    import numpy as np

    from mdio_cpp_spark.operators import similarity

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    auto = similarity.knn_join(df, "vec_id", "embedding", dim=8, k=2)
    expl = similarity.knn_join(
        df, "vec_id", "embedding", dim=8, k=2,
        n_planes=similarity.adaptive_n_planes(300),
    )
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, expl.collect()))


def test_corpus_count_cached_across_knn_and_radius(spark):
    """One count job per corpus frame: knn_join and radius_join on the
    SAME DataFrame must reuse the cached size for adaptive_n_planes
    (round-6 verdict item 7)."""
    from unittest import mock

    from mdio_cpp_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float(i % 5), float((i * 3) % 7)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    with mock.patch.object(
        type(df), "count", autospec=True, side_effect=type(df).count
    ) as spy:
        similarity.knn_join(df, "vec_id", "embedding", dim=2, k=2).collect()
        similarity.radius_join(df, "vec_id", "embedding", dim=2,
                               threshold=0.5).collect()
    assert spy.call_count == 1
