"""Unit tests for the isel/sel selection surface — the reference's operator
semantics (clamping, stride, inclusivity, error cases) from
mdio/dataset_test.cc:395-921 and mdio/variable_test.cc:609-960, re-expressed
over relational test tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.operators import selection


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return table(spark, sf_dir, "orders")


def test_isel_half_open(orders):
    rows = selection.isel(orders, "o_orderkey", 10, 20).select("o_orderkey").collect()
    keys = {r[0] for r in rows}
    assert keys and all(10 <= k < 20 for k in keys)


def test_isel_clamps_out_of_domain(orders):
    # slice past the domain end matches nothing extra (variable.h:1211-1232)
    n_all = orders.count()
    assert selection.isel(orders, "o_orderkey", 0, 10**12).count() == n_all


def test_isel_stride(orders):
    rows = selection.isel(orders, "o_orderkey", 0, 100, step=3).select("o_orderkey").collect()
    assert rows and all(r[0] % 3 == 0 for r in rows)


def test_isel_multi_is_union_of_ranges(orders):
    both = selection.isel_multi(orders, "o_orderkey", [(10, 20), (50, 60)]).count()
    a = selection.isel(orders, "o_orderkey", 10, 20).count()
    b = selection.isel(orders, "o_orderkey", 50, 60).count()
    assert both == a + b


def test_isel_multi_empty_ranges(orders):
    assert selection.isel_multi(orders, "o_orderkey", []).count() == 0


def test_sel_range_is_stop_inclusive(orders):
    # sel ranges include the stop value (dataset.h:872-876), unlike isel
    lo = orders.agg(F.min("o_orderkey")).collect()[0][0]
    hi = lo + 5
    keys = {r[0] for r in selection.sel_range(orders, "o_orderkey", lo, hi).select("o_orderkey").collect()}
    assert hi in keys


def test_sel_value_strict_raises_on_missing(orders):
    with pytest.raises(ValueError, match="not found"):
        selection.sel_value(orders, "o_orderkey", -1, strict=True)


def test_sel_range_strict_raises_on_duplicate_endpoint(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    # l_orderkey repeats across line numbers → duplicated endpoint (dataset.h:824-838)
    some_key = li.agg(F.min("l_orderkey")).collect()[0][0]
    dup = li.filter(F.col("l_orderkey") == some_key).count()
    if dup > 1:
        with pytest.raises(ValueError, match="duplicated"):
            selection.sel_range(li, "l_orderkey", some_key, some_key + 10, strict=True)


def test_sel_isin_rejects_duplicate_request(orders):
    with pytest.raises(ValueError, match="duplicate"):
        selection.sel_isin(orders, "o_orderkey", [1, 1])


def test_select_field_prunes_struct(orders):
    hdr = orders.select("o_orderkey", F.struct("o_orderdate", "o_orderpriority").alias("h"))
    out = selection.select_field(hdr, "h", "o_orderdate")
    assert out.columns == ["o_orderkey", "o_orderdate"]


def test_filter_pushdown_reaches_parquet_scan(orders):
    plan = selection.isel(orders, "o_orderkey", 100, 200)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderkey" in plan


# ---------------------------------------------------- pipeline extension ops

def test_duplicate_clusters_components(spark):
    from mdio_cpp_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (20, 21), (3, 4)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7, 20: 20, 21: 20}


def test_stratified_hash_sample_deterministic(spark):
    from mdio_cpp_spark.operators.sampling import stratified_hash_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = stratified_hash_sample(df, "doc_id", "lang", {"en": 0.25}, default_rate=0.75)
    pdf = out.groupBy("lang").count().toPandas().set_index("lang")["count"]
    # rates are approximate (hash-uniform), determinism is exact
    assert 150 < pdf["en"] < 350 and 650 < pdf["de"] < 850
    again = stratified_hash_sample(df.repartition(7), "doc_id", "lang", {"en": 0.25}, 0.75)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(r["doc_id"] for r in again.collect())


def test_sequence_packing_budget(spark):
    from mdio_cpp_spark.operators.sampling import sequence_packing

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = sequence_packing(df, "doc_id", F.lit(100), budget=256, n_shards=4).toPandas()
    # within each shard, pack_id is nondecreasing in doc order and start
    # offsets step by exactly n_tok
    for _, g in out.sort_values("doc_id").groupby("shard"):
        starts = g["start_off"].to_numpy()
        assert (starts[1:] - starts[:-1] == 100).all()
        assert (g["pack_id"].to_numpy() == starts // 256).all()


def test_new_pipeline_query_plan_shapes(spark, sf_dir):
    """Plan-quality pins for the corpus queries: the top-1-per-group filter
    must run as WindowGroupLimit (partial before the shuffle), windows must
    be hash-partitioned (never SinglePartition), and p02's quality filter
    must evaluate at the scan, before any exchange."""
    from mdio_cpp_spark.plans import REGISTRY

    t = (
        REGISTRY["t07_tfidf"].spark(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in t and "hashpartitioning(doc_id" in t

    p = (
        REGISTRY["p02_corpus_curation"].spark(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in p
    assert "DataFilters: [(round" in p  # quality gate computed map-side at the scan


def test_grouped_percentiles_matches_udaf(spark):
    """grouped_percentiles (distributed rank lookup) must agree with Spark's
    percentile UDAF on duplicate-heavy data and on a single-row group."""
    from pyspark.sql import functions as F

    from mdio_cpp_spark.operators.stats import grouped_percentiles

    rows = [("a", float(v)) for v in [1, 1, 1, 2, 2, 3, 10, 10, 50, 100]]
    rows += [("b", float(v)) for v in range(1, 8)]
    rows += [("c", 42.0)]  # n=1: every percentile is the single value
    df = spark.createDataFrame(rows, "g string, v double")

    got = {
        r["g"]: (r["p50"], r["p90"])
        for r in grouped_percentiles(df, "g", "v", [(0.5, "p50"), (0.9, "p90")]).collect()
    }
    want = {
        r["g"]: (r["p50"], r["p90"])
        for r in df.groupBy("g")
        .agg(
            F.round(F.expr("percentile(v, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(v, 0.9)"), 4).alias("p90"),
        )
        .collect()
    }
    assert got == want and set(got) == {"a", "b", "c"}


def test_grouped_percentiles_empty_input(spark):
    from mdio_cpp_spark.operators.stats import grouped_percentiles

    df = spark.createDataFrame([], "g string, v double")
    out = grouped_percentiles(df, "g", "v", [(0.5, "p50")])
    assert out.columns == ["g", "p50"] and out.count() == 0


def test_grouped_percentiles_caller_bounds(spark):
    """bounds=(lo, hi) skips the bounds pass without changing results —
    exact under tight, loose, AND wrong bounds (out-of-range values clamp
    into the end buckets but the rank arithmetic never sees bucket ids,
    only counts, so ordering is all that matters). Empty input with bounds
    supplied must still return the schema-correct empty frame."""
    from pyspark.sql import functions as F

    from mdio_cpp_spark.operators.stats import grouped_percentiles

    rows = [("a", float(v)) for v in [1, 1, 1, 2, 2, 3, 10, 10, 50, 100]]
    rows += [("b", float(v)) for v in range(1, 8)]
    df = spark.createDataFrame(rows, "g string, v double")
    want = {
        r["g"]: (r["p50"], r["p90"])
        for r in df.groupBy("g")
        .agg(
            F.round(F.expr("percentile(v, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(v, 0.9)"), 4).alias("p90"),
        )
        .collect()
    }
    for b in [(1.0, 100.0), (-1e6, 1e6), (40.0, 45.0)]:  # tight, loose, wrong
        got = {
            r["g"]: (r["p50"], r["p90"])
            for r in grouped_percentiles(
                df, "g", "v", [(0.5, "p50"), (0.9, "p90")], bounds=b
            ).collect()
        }
        assert got == want, f"bounds={b}"

    empty = spark.createDataFrame([], "g string, v double")
    out = grouped_percentiles(empty, "g", "v", [(0.5, "p50")], bounds=(0.0, 1.0))
    assert out.columns == ["g", "p50"] and out.count() == 0


def test_grouped_percentiles_randomized_differential(spark):
    """Percentile rewrite vs Spark's exact percentile UDAF over adversarial
    distributions: duplicates, skew, negatives, tiny groups, constants."""
    import random

    from pyspark.sql import functions as F

    from mdio_cpp_spark.operators.stats import grouped_percentiles

    rng = random.Random(42)
    rows = []
    # g0: heavy duplicates; g1: log-skew; g2: negatives; g3: tiny; g4: constant
    for _ in range(2000):
        rows.append(("g0", float(rng.choice([1.0, 2.0, 3.0]))))
        rows.append(("g1", float(10 ** (rng.random() * 6))))
        rows.append(("g2", float(rng.uniform(-1e6, -1))))
    rows += [("g3", v) for v in (5.0, 7.0)]
    rows += [("g4", 13.37)] * 50
    df = spark.createDataFrame(rows, "g string, v double")

    ps = [(0.01, "p01"), (0.5, "p50"), (0.9, "p90"), (0.999, "p999")]
    got = {r["g"]: r for r in grouped_percentiles(df, "g", "v", ps).collect()}
    exact = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(*[F.round(F.expr(f"percentile(v, {p})"), 4).alias(n) for p, n in ps])
        .collect()
    }
    assert set(got) == set(exact)
    for g in exact:
        for _, name in ps:
            assert got[g][name] == exact[g][name], (g, name, got[g][name], exact[g][name])


def test_duplicate_clusters_paths_agree(spark, monkeypatch):
    """The driver union-find fast path and the distributed min-label
    iteration must produce identical cluster labelings."""
    from mdio_cpp_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20), (30, 1)],
        "doc_a long, doc_b long",
    )
    fast = sorted(tuple(r) for r in dedup.duplicate_clusters(pairs).collect())
    monkeypatch.setattr(dedup, "_SMALL_GRAPH_LIMIT", 0)
    slow = sorted(tuple(r) for r in dedup.duplicate_clusters(pairs).collect())
    assert fast == slow
    assert fast == [
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (30, 1),
    ]


def test_grouped_percentiles_high_cardinality_groups(spark):
    """≥10k distinct groups: the pass-2 metadata (counts, offsets, targets)
    must stay distributed — no (group × bucket)-row driver collect — and
    the answers must still be quantile_cont-exact per group."""
    from pyspark.sql import functions as F

    from mdio_cpp_spark.operators.stats import grouped_percentiles

    # 10,000 groups × 7 values: group g holds {g, g+1, ..., g+6}
    df = (
        spark.range(10_000)
        .select(F.col("id").alias("g"))
        .join(spark.range(7).select(F.col("id").alias("k")))
        .select("g", (F.col("g") + F.col("k")).cast("double").alias("v"))
    )
    out = grouped_percentiles(df, "g", "v", [(0.5, "p50"), (0.25, "p25")])
    rows = {r["g"]: r for r in out.collect()}
    assert len(rows) == 10_000
    # p50 of {g..g+6} = g+3; p25 = g + 1.5 (quantile_cont interpolation)
    for g in (0, 1, 4_999, 9_999):
        assert rows[g]["p50"] == float(g + 3)
        assert rows[g]["p25"] == float(g) + 1.5


def test_zip_index_is_exact_sorted_permutation(spark):
    """_zip_index (the no-global-window zipWithIndex) must assign EXACTLY
    0..n-1, in the total order of its sort keys, for awkward shapes:
    duplicate keys, skewed clusters, negatives, and n smaller than the
    parallelism (empty quantile buckets)."""
    import random

    from mdio_cpp_spark.plans.zarr_queries import _zip_index
    from pyspark.sql import functions as F

    rng = random.Random(7)
    cases = [
        [(rng.choice([1.0, 2.0, 3.0]), i) for i in range(50)],   # heavy dups
        [(float(rng.randint(-5, 5)), i) for i in range(200)],    # negatives
        [(1.0, i) for i in range(7)],                            # constant, tiny
        [(rng.random() * (10 ** rng.randint(0, 6)), i) for i in range(300)],  # skew
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "k double, tie long")
        out = _zip_index(df, ["k", "tie"], F.col("k"), "idx").collect()
        got = sorted((r["idx"], r["k"], r["tie"]) for r in out)
        assert [g[0] for g in got] == list(range(len(rows)))
        expect = sorted((k, t) for k, t in rows)
        assert [(g[1], g[2]) for g in got] == expect
