"""Unit tests for the round-4 additions: merge_changeset edge semantics,
fixed-size hash sampling, and multi-probe IVF recall."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from mdio_cpp_spark.operators.merge import merge_changeset
from mdio_cpp_spark.operators.sampling import fixed_size_hash_sample
from mdio_cpp_spark.operators import similarity


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, p double",
    )


@pytest.mark.parametrize("bc", [True, False])
def test_merge_update_delete_insert(spark, bc):
    chg = spark.createDataFrame(
        [(2, "U", "B", 99.0), (3, "D", None, None), (9, "I", "z", 9.0)],
        "k long, op string, s string, p double",
    )
    out = {
        r["k"]: (r["s"], r["p"])
        for r in merge_changeset(_target(spark), chg, "k", ["s", "p"], broadcast_changes=bc).collect()
    }
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 4: ("d", 40.0), 9: ("z", 9.0)}


@pytest.mark.parametrize("bc", [True, False])
def test_merge_matched_insert_is_noop_and_unmatched_update_drops(spark, bc):
    chg = spark.createDataFrame(
        [(1, "I", "XX", 0.0), (77, "U", "no", 0.0), (78, "D", None, None)],
        "k long, op string, s string, p double",
    )
    out = {
        r["k"]: (r["s"], r["p"])
        for r in merge_changeset(_target(spark), chg, "k", ["s", "p"], broadcast_changes=bc).collect()
    }
    # matched I leaves row 1 untouched; U/D on absent keys emit nothing
    assert out == {1: ("a", 10.0), 2: ("b", 20.0), 3: ("c", None), 4: ("d", 40.0)}


@pytest.mark.parametrize("bc", [True, False])
def test_merge_null_payloads_survive(spark, bc):
    """A target row whose value columns are all NULL must not be mistaken
    for 'absent' (the sentinel, not the payload, decides presence)."""
    chg = spark.createDataFrame([(3, "U", "C", 33.0)], "k long, op string, s string, p double")
    out = {
        r["k"]: (r["s"], r["p"])
        for r in merge_changeset(_target(spark), chg, "k", ["s", "p"], broadcast_changes=bc).collect()
    }
    assert out[3] == ("C", 33.0) and len(out) == 4


def test_fixed_size_sample_exact_k_and_stable(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = 5
    s1 = fixed_size_hash_sample(d, "doc_id", "lang", k).select("doc_id", "lang", "smp_rank")
    counts = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(k, sizes[lang])
    # deterministic under repartitioning
    s2 = fixed_size_hash_sample(d.repartition(7), "doc_id", "lang", k).select(
        "doc_id", "lang", "smp_rank"
    )
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


def test_ivf_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3)
    exact = similarity.cosine_topk(e, q, "vec_id", "embedding", k=5)
    single = similarity.ivf_topk(e, q, "vec_id", "embedding", k=5, n_cells=8)
    multi = similarity.ivf_topk_multiprobe(
        e, q, "vec_id", "embedding", k=5, n_cells=8, n_probes=2
    )

    def hits(df):
        return {(r["q_id"], r["vec_id"]) for r in df.collect()}

    truth = hits(exact)
    assert len(hits(multi) & truth) >= len(hits(single) & truth)


def test_temperature_resample_flattens_skew(spark):
    from mdio_cpp_spark.operators.sampling import temperature_rates, temperature_resample

    rows = [(i, "big" if i < 400 else "small") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, s string")
    rates = {r["s"]: (r["n_orig"], r["rate"]) for r in temperature_rates(df, "s").collect()}
    assert rates["small"] == (100, 1.0)  # smallest stratum keeps everything
    assert abs(rates["big"][1] - 0.5) < 1e-12  # sqrt(100/400)
    out = temperature_resample(df, "id", "s")
    n = {r["s"]: r["c"] for r in out.groupBy("s").agg(F.count("*").alias("c")).collect()}
    assert n["small"] == 100
    assert 150 < n["big"] < 250  # ~0.5 keep rate through the 12-bit hash
    # membership is a pure function of the row — partitioning-independent
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in temperature_resample(df.repartition(13), "id", "s").collect())
    assert a == b


# ------------------------------------------------------------- SCD Type 2

def _scd2_target(spark):
    # key 1: history row + current row; keys 2-4: current only
    return spark.createDataFrame(
        [
            (1, 10.0, "2020-01-01", "2021-01-01"),   # closed history version
            (1, 11.0, "2021-01-01", None),           # current
            (2, 20.0, "2020-01-01", None),
            (3, 30.0, "2020-01-01", None),
            (4, 40.0, "2020-01-01", None),
        ],
        "key long, value double, valid_from string, valid_to string",
    ).select(
        "key", "value",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    )


def test_scd2_versions_close_and_open(spark):
    from mdio_cpp_spark.operators.merge import scd2_apply

    changes = spark.createDataFrame(
        [
            (1, 12.0, "2022-06-01"),  # changed → close current, open new
            (2, 20.0, "2022-06-01"),  # identical value → no-op
            (9, 90.0, "2022-06-01"),  # unmatched key → insert
        ],
        "key long, value double, change_date string",
    ).withColumn("change_date", F.col("change_date").cast("date"))
    rows = {
        (r["key"], r["value"]): (str(r["valid_from"]), r["valid_to"] and str(r["valid_to"]))
        for r in scd2_apply(_scd2_target(spark), changes, "key", "value").collect()
    }
    assert rows == {
        (1, 10.0): ("2020-01-01", "2021-01-01"),   # history untouched
        (1, 11.0): ("2021-01-01", "2022-06-01"),   # closed at change date
        (1, 12.0): ("2022-06-01", None),           # new current version
        (2, 20.0): ("2020-01-01", None),           # no-change suppressed
        (3, 30.0): ("2020-01-01", None),
        (4, 40.0): ("2020-01-01", None),
        (9, 90.0): ("2022-06-01", None),           # insert
    }


def test_scd2_reapply_is_idempotent(spark):
    from mdio_cpp_spark.operators.merge import scd2_apply

    changes = spark.createDataFrame(
        [(1, 12.0, "2022-06-01")], "key long, value double, change_date string"
    ).withColumn("change_date", F.col("change_date").cast("date"))
    once = scd2_apply(_scd2_target(spark), changes, "key", "value")
    twice = scd2_apply(once, changes, "key", "value")
    # re-delivering the same change must not spawn another version: the new
    # current row already carries the value, so the no-change guard holds
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_null_safe_and_history_only_keys(spark):
    from mdio_cpp_spark.operators.merge import scd2_apply

    target = spark.createDataFrame(
        [
            (1, None, "2020-01-01", None),          # current with NULL value
            (2, 20.0, "2020-01-01", None),          # current, will be set to NULL
            (3, 30.0, "2020-01-01", "2021-01-01"),  # history ONLY — no current row
        ],
        "key long, value double, valid_from string, valid_to string",
    ).select(
        "key", "value",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    )
    changes = spark.createDataFrame(
        [(1, 7.0, "2022-06-01"),    # NULL -> 7.0 must version
         (2, None, "2022-06-01"),   # 20.0 -> NULL must version
         (3, 9.0, "2022-06-01")],   # history-only key must insert a current row
        "key long, value double, change_date string",
    ).withColumn("change_date", F.col("change_date").cast("date"))
    rows = {
        (r["key"], r["value"]): (str(r["valid_from"]), r["valid_to"] and str(r["valid_to"]))
        for r in scd2_apply(target, changes, "key", "value").collect()
    }
    assert rows == {
        (1, None): ("2020-01-01", "2022-06-01"),
        (1, 7.0): ("2022-06-01", None),
        (2, 20.0): ("2020-01-01", "2022-06-01"),
        (2, None): ("2022-06-01", None),
        (3, 30.0): ("2020-01-01", "2021-01-01"),   # history untouched
        (3, 9.0): ("2022-06-01", None),            # insert despite history match
    }


def test_coordinated_sample_join_lossless(spark, sf_dir):
    """s11's contract: sampling BOTH tables with the same hash predicate on
    the join key keeps every sampled order's full lineitem set — zero
    orphan lineitems, and per-sampled-order line counts identical to the
    unsampled table's counts for those keys."""
    from mdio_cpp_spark.catalog import table
    from mdio_cpp_spark.operators.sampling import hash_fraction

    cut = F.lit(256.0)
    o = table(spark, sf_dir, "orders").filter(
        hash_fraction(F.col("o_orderkey")) < cut
    ).select("o_orderkey")
    li_all = table(spark, sf_dir, "lineitem").select("l_orderkey")
    li_s = li_all.filter(hash_fraction(F.col("l_orderkey")) < cut)

    # no sampled lineitem lacks its order (coordination, not luck)
    orphans = li_s.join(o, li_s["l_orderkey"] == o["o_orderkey"], "left_anti")
    assert orphans.count() == 0

    # sampled per-order line counts == full-table counts for sampled keys
    full = {
        r["l_orderkey"]: r["n"]
        for r in li_all.join(o, li_all["l_orderkey"] == o["o_orderkey"], "left_semi")
        .groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    samp = {
        r["l_orderkey"]: r["n"]
        for r in li_s.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert full == samp and len(samp) > 0
