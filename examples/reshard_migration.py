"""Migrate a legacy chunk-per-object store into the ZEP-2 sharded layout.

A petascale array stored as one object per chunk (the zarr v2 default)
puts millions of tiny objects on the store; the sharded v3 layout packs an
indexed grid of inner chunks into each shard object. `reshard_array`
performs the migration with a plan partitioned over DESTINATION shards —
one source-box read + one object write per task, zero shuffle, fill-only
shards elided — and the migrated store reads back through the same scan
API with object-level zone pruning plus partial (range-GET) inner-chunk
fetches.

Run: python examples/reshard_migration.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mdio_cpp_spark.session import get_spark
from mdio_cpp_spark.sources.reader import scan_array
from mdio_cpp_spark.sources.writer import write_array
from mdio_cpp_spark.sources.zarr_store import ZarrStore
from mdio_cpp_spark.utils.transcode import reshard_array


def _count_objects(root: str, var: str) -> int:
    return sum(len(fs) for _, _, fs in os.walk(os.path.join(root, var)))


def main() -> None:
    spark = get_spark("reshard-example", master="local[4]")
    base = tempfile.mkdtemp(prefix="reshard_demo_")
    legacy = os.path.join(base, "legacy.zarr")
    sharded = os.path.join(base, "sharded.zarr")

    # the "legacy" store: v2, zlib, 512-cell chunks -> many small objects
    n = 60_000
    st = ZarrStore.create(legacy, version=2, attrs={"name": "demo"})
    st.create_array("price", shape=(n,), chunks=(512,), dtype="float64",
                    dims=("i",), compressor={"id": "zlib", "level": 1})
    st.consolidate()
    df = spark.range(n).select(F.col("id").alias("i"),
                               (F.col("id") % 977).cast("double").alias("v"))
    write_array(df, legacy, "price", value_cols="v")
    print(f"legacy objects: {_count_objects(legacy, 'price')}")

    # migrate: 8192-cell shards of 512-cell blosc-lz4 inner chunks
    report = reshard_array(
        spark, legacy, sharded, "price", shards=(8192,),
        compressor={"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
    )
    print(f"migration report: {report}")
    print(f"sharded objects: {_count_objects(sharded, 'price')}")

    # same scan API; a narrow slice takes the partial shard-read path
    out = (scan_array(spark, sharded, "price", ranges={"i": (10_000, 10_050)})
           .orderBy("i"))
    rows = out.collect()
    assert [r["i"] for r in rows] == list(range(10_000, 10_050))
    assert all(r["value"] == r["i"] % 977 for r in rows)
    print("sliced read through the sharded store: OK")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
