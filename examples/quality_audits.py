"""Data-quality audit tour: the dq/d/t audits a pipeline runs before it
trusts (or trains on) a dataset — driven through the public registry.

Run: python examples/quality_audits.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from mdio_cpp_spark.plans import REGISTRY
from mdio_cpp_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("quality-example", master="local[4]")

    print("== Benford first-digit screen on order totals")
    REGISTRY["dq08_benford"].spark(spark, SF).show()

    print("== do order totals reconcile against their lineitems?")
    REGISTRY["dq09_value_reconciliation"].spark(spark, SF).show()

    print("== fuzzy (MinHash) train/val split leakage — near-dups across the split")
    REGISTRY["d15_fuzzy_split_leakage"].spark(spark, SF).show(8)

    print("== bigram novelty of the val split (how much eval is unseen phrasing)")
    REGISTRY["t25_bigram_novelty"].spark(spark, SF).show()

    print("== coordinated 1/16 keyspace sample — unbiased per-order estimates")
    REGISTRY["s11_coordinated_sample"].spark(spark, SF).show()

    print("== feature-redundancy screen: one-pass correlation matrix")
    REGISTRY["a17_correlation_matrix"].spark(spark, SF).show()

    print("== distribution shape per group: skewness / excess kurtosis")
    REGISTRY["a18_grouped_skew_kurt"].spark(spark, SF).show()

    spark.stop()


if __name__ == "__main__":
    main()
