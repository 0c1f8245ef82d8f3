"""Apply a CDC changeset to a table with MERGE semantics — operators/merge.py.

The broadcast strategy keeps the target completely un-shuffled (U/D through a
BroadcastHashJoin left-outer, inserts from a broadcast semi-probe), which is
the plan you want when a 100 TB table absorbs a small change batch.

Run: python examples/cdc_merge.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.operators.merge import merge_changeset
from mdio_cpp_spark.session import get_spark


def main() -> None:
    spark = get_spark("cdc-merge-example", master="local[4]")
    orders = table(spark, "/root/testdata/sf0.001", "orders")

    # a synthetic CDC batch: reprice one order, drop one, add one
    some = [r["o_orderkey"] for r in orders.select("o_orderkey").limit(2).collect()]
    changes = spark.createDataFrame(
        [
            (some[0], "U", "F", 123.45),          # update price
            (some[1], "D", None, None),            # delete
            (10_000_001, "I", "N", 67.89),         # insert a new key
        ],
        "o_orderkey long, op string, o_orderstatus string, o_totalprice double",
    )

    merged = merge_changeset(
        orders, changes, "o_orderkey", ["o_orderstatus", "o_totalprice"]
    )
    before, after = orders.count(), merged.count()
    print(f"rows before={before} after={after} (one delete, one insert)")
    merged.filter(
        F.col("o_orderkey").isin(some[0], some[1], 10_000_001)
    ).orderBy("o_orderkey").show()
    merged.explain()  # no Exchange on the target side


if __name__ == "__main__":
    main()
