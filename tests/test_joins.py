"""As-of join unit tests: per-key carry, inner-vs-left, same-row struct
guarantee, bucket-boundary carry (values crossing many empty buckets)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from mdio_cpp_spark.operators.joins import asof_join


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(1, 5)), (2, "a", _ts(3)), (3, "b", _ts(2)), (4, "b", _ts(9)),
         (5, "a", _ts(1, 0))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts(1, 1), 10.0, 100.0), ("a", _ts(2), 20.0, 200.0),
         ("b", _ts(5), 30.0, 300.0)],
        "k string, rts timestamp, v1 double, v2 double",
    )
    return left, right


def test_asof_per_key_inner(frames, spark):
    left, right = frames
    out = asof_join(left, right, "ts", "rts", ["v1", "v2"], partition_keys=["k"],
                    how="inner", bucket_seconds=86_400).orderBy("id").collect()
    # id=5 (ts before first 'a' right row) and id=3 (before first 'b') dropped
    assert [r["id"] for r in out] == [1, 2, 4]
    assert [(r["v1"], r["v2"]) for r in out] == [(10.0, 100.0), (20.0, 200.0), (30.0, 300.0)]


def test_asof_per_key_left_keeps_unmatched(frames, spark):
    left, right = frames
    out = asof_join(left, right, "ts", "rts", ["v1", "v2"], partition_keys=["k"],
                    how="left", bucket_seconds=86_400).orderBy("id").collect()
    assert [r["id"] for r in out] == [1, 2, 3, 4, 5]
    by_id = {r["id"]: (r["v1"], r["v2"]) for r in out}
    assert by_id[3] == (None, None) and by_id[5] == (None, None)
    # id=4 matched across 3 empty buckets (days 6-8) — boundary carry works
    assert by_id[4] == (30.0, 300.0)


def test_asof_values_from_same_right_row(spark):
    # v1/v2 must come from ONE right row even when a later row has a NULL v2
    left = spark.createDataFrame([(1, _ts(4))], "id long, ts timestamp")
    right = spark.createDataFrame(
        [(_ts(1), 1.0, 11.0), (_ts(2), 2.0, None)],
        "rts timestamp, v1 double, v2 double",
    )
    row = asof_join(left, right, "ts", "rts", ["v1", "v2"], how="inner",
                    bucket_seconds=86_400).collect()[0]
    # latest right row is (2.0, NULL) — per-column carry would wrongly give
    # (2.0, 11.0); struct carry gives the actual row
    assert (row["v1"], row["v2"]) == (2.0, None)


def test_asof_bad_how(frames):
    left, right = frames
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, "ts", "rts", ["v1"], how="full")


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both sides of a recurring join key eliminates the join
    shuffle entirely — the co-location pattern for repeated big-big joins at
    scale. Asserts the physical plan has NO Exchange above either scan and
    that results match the plain join."""
    from pyspark.sql import functions as F

    from mdio_cpp_spark.catalog import table

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path / 'wh'}'")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        (
            table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
            .mode("overwrite").saveAsTable("bktdb.cust_b")
        )
        (
            table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
            .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
            .mode("overwrite").saveAsTable("bktdb.ord_b")
        )
        c = spark.table("bktdb.cust_b")
        o = spark.table("bktdb.ord_b")
        joined = c.join(o, c.c_custkey == o.o_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        expected = (
            table(spark, sf_dir, "customer")
            .join(table(spark, sf_dir, "orders"),
                  F.col("c_custkey") == F.col("o_custkey"))
            .count()
        )
        assert joined.count() == expected and expected > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bktdb.cust_b")
        spark.sql("DROP TABLE IF EXISTS bktdb.ord_b")
        spark.sql("DROP DATABASE IF EXISTS bktdb")


def test_asof_join_forward_direction(spark):
    """direction='forward': each left row takes the EARLIEST right row with
    rts >= lts (inclusive), per key — the time-mirror of the backward join,
    verified against a hand-computed expectation."""
    from pyspark.sql import functions as F

    from mdio_cpp_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("a", 10), ("a", 25), ("a", 40), ("b", 10)], "k string, t long"
    ).select("k", F.timestamp_seconds("t").alias("ts"))
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 30, 2.0), ("b", 5, 9.0)], "k string, t long, v double"
    ).select("k", F.timestamp_seconds("t").alias("rts"), "v")

    out = asof_join(left, right, "ts", "rts", ["v"], partition_keys=["k"],
                    how="left", direction="forward")
    got = {(r["k"], r["ts"].second + r["ts"].minute * 60): r["v"] for r in out.collect()}
    assert got == {
        ("a", 10): 1.0,   # inclusive: rts == lts matches
        ("a", 25): 2.0,   # earliest at-or-after
        ("a", 40): None,  # nothing after → NULL under how='left'
        ("b", 10): None,  # b's only right row is BEFORE
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_asof_matches_pandas_merge_asof(spark, direction, how):
    """Independent cross-validation: the bucketed distributed as-of must
    reproduce pandas.merge_asof exactly on randomized keyed data (unique
    right timestamps per key so both sides' tie rules are moot). The
    DuckDB differential shares our SQL formulation; pandas is a third
    implementation."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    base = pd.Timestamp("2024-01-01")
    n_l, n_r = 300, 80
    left = pd.DataFrame({
        "id": np.arange(n_l),
        "k": rng.choice(["a", "b", "c"], n_l),
        "ts": base + pd.to_timedelta(rng.randint(0, 3_000_000, n_l), unit="s"),
    })
    rts = rng.choice(3_000_000, size=n_r, replace=False)  # unique instants
    right = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n_r),
        "rts": base + pd.to_timedelta(rts, unit="s"),
        "v": rng.randint(0, 1_000_000, n_r).astype(float),
    })
    expected = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("rts"),
        left_on="ts", right_on="rts", by="k",
        direction=direction, allow_exact_matches=True,
    ).sort_values("id").reset_index(drop=True)
    if how == "inner":
        expected = expected[expected["v"].notna()].reset_index(drop=True)

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "ts", "rts", ["v"],
            partition_keys=["k"], how=how, direction=direction,
            bucket_seconds=86_400,
        )
        .select("id", "v")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(got) == len(expected), f"{direction}/{how}: row count"
    exp = expected[["id", "v"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_nearest_us_matches_two_pass_composition(spark):
    """asof_nearest_us (round-11: both directions in ONE bucketed pass)
    must agree with the generic backward+forward asof_join composition on
    randomized keyless data — including duplicate right instants, left
    timestamps exactly equal to right ones (inclusive both directions),
    and left rows before the first / after the last right row."""
    import numpy as np
    import pandas as pd

    from mdio_cpp_spark.operators.joins import asof_nearest_us

    rng = np.random.RandomState(11)
    base = pd.Timestamp("2024-01-01")
    secs_r = rng.randint(0, 900_000, 60)
    secs_r[:5] = secs_r[5:10]  # duplicate right instants
    secs_l = np.concatenate([
        rng.randint(0, 900_000, 200),
        secs_r[:3],            # exact-match left rows
        [0, 899_999],          # before-first / after-last extremes
    ])
    left = spark.createDataFrame(
        pd.DataFrame({
            "id": np.arange(len(secs_l)),
            "ts": base + pd.to_timedelta(secs_l, unit="s"),
        })
    )
    right = spark.createDataFrame(
        pd.DataFrame({"rts": base + pd.to_timedelta(secs_r, unit="s")})
    )
    got = {
        r["id"]: (r["__prev_us"], r["__next_us"])
        for r in asof_nearest_us(left, right, "ts", "rts",
                                 bucket_seconds=86_400).collect()
    }
    epoch0 = int(base.timestamp()) * 1_000_000
    us_r = np.sort(epoch0 + secs_r.astype("int64") * 1_000_000)
    for i, s in enumerate(secs_l):
        us = epoch0 + int(s) * 1_000_000
        prev = us_r[us_r <= us]
        nxt = us_r[us_r >= us]
        assert got[i] == (
            int(prev[-1]) if len(prev) else None,
            int(nxt[0]) if len(nxt) else None,
        ), f"row {i}"
