"""Salted join / salted aggregation must be result-equivalent to their
unsalted forms (salting changes the shuffle shape, never the answer)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.operators.skew import salted_agg_count, salted_join, with_salt


def test_salted_join_equals_plain_join(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    # skew the key space: everything collapses onto 3 priorities
    dim = o.select("o_orderpriority").distinct().withColumn("prio_rank", F.length("o_orderpriority"))
    plain = o.join(dim, on=["o_orderpriority"]).select("o_orderkey", "prio_rank")
    salted = salted_join(o, dim, on=["o_orderpriority"], n_salts=4).select("o_orderkey", "prio_rank")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_agg_equals_plain_count(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    plain = {r["l_returnflag"]: r["cnt"] for r in
             li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r["l_returnflag"]: r["cnt"] for r in
              salted_agg_count(li, ["l_returnflag"], n_salts=8).collect()}
    assert plain == salted


def test_salt_is_deterministic(spark, sf_dir):
    o = table(spark, sf_dir, "orders").limit(100)
    a = with_salt(o, 8).select("o_orderkey", "__salt").collect()
    b = with_salt(o, 8).select("o_orderkey", "__salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_topk_per_group_equals_single_window(spark):
    """Salted two-phase top-k must equal the textbook group-partitioned
    window on a skewed frame (one giant group, several tiny ones, ties)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mdio_cpp_spark.operators.sorting import topk_per_group

    rows = [("hot", i, float(i % 7)) for i in range(5000)]  # heavy + many ties
    rows += [("tiny%d" % g, i, float(i)) for g in range(5) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, id long, v double").repartition(16)
    order = [F.col("v").desc(), F.col("id")]  # tie-break → total order
    got = {
        (r["g"], r["rk"]): r["id"]
        for r in topk_per_group(df, ["g"], order, k=4, n_salts=8, salt_on="id").collect()
    }
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        (r["g"], r["rk"]): r["id"]
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 4)
        .collect()
    }
    assert got == want
