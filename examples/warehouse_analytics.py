"""Warehouse-style analytics tour: event funnel, cohort retention, and a
Type-2 slowly-changing dimension — the plans/analytics.py operators driven
directly.

Run: python examples/warehouse_analytics.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.operators.merge import scd2_apply
from mdio_cpp_spark.plans import REGISTRY
from mdio_cpp_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("warehouse-example", master="local[4]")

    print("== funnel: view → click → purchase (strict temporal order)")
    REGISTRY["ev01_funnel"].spark(spark, SF).show()

    print("== weekly cohort retention matrix")
    REGISTRY["ev02_cohort_retention"].spark(spark, SF).show()

    print("== SCD2: version the customer dimension from an order-derived CDC batch")
    customers = table(spark, SF, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("value"),
        F.lit("1995-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    changes = (
        table(spark, SF, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("key"),
            F.col("o_totalprice").alias("value"),
            F.to_date("o_orderdate").alias("change_date"),
        )
    )
    versioned = scd2_apply(customers, changes, "key", "value")
    versioned.orderBy("key", "valid_from").show(8)
    print("rows:", versioned.count(), "(one closed + one current version per changed key)")

    print("== the 22 TPC-H shapes are declared queries too, e.g. Q15:")
    REGISTRY["h15_top_supplier"].spark(spark, SF).show()


if __name__ == "__main__":
    main()
