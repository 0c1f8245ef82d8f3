"""hello_mdio — create, write, and read back an MDIO dataset on Spark.

Mirrors the reference's examples/hello_mdio: build a dataset from a JSON
spec, write a variable, reopen, and read a slice. Run:

    python examples/hello_mdio.py
"""

from __future__ import annotations

import shutil
import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from mdio_cpp_spark.model import MdioDataset
from mdio_cpp_spark.session import get_spark
from mdio_cpp_spark.sources.writer import dense_fill_frame

SPEC = {
    "metadata": {"name": "hello_mdio", "apiVersion": "1.0.0",
                 "attributes": {"example": True}},
    "variables": [
        {"name": "image", "dataType": "float32",
         "dimensions": [{"name": "inline", "size": 128}, {"name": "crossline", "size": 96}],
         "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [64, 64]}}},
         "coordinates": ["inline", "crossline"]},
        {"name": "inline", "dataType": "int32", "dimensions": [{"name": "inline", "size": 128}]},
        {"name": "crossline", "dataType": "int32", "dimensions": [{"name": "crossline", "size": 96}]},
    ],
}


def main() -> None:
    spark = get_spark("hello-mdio", master="local[8]")
    path = "/root/repo/.zarr_cache/_example_hello.zarr"
    shutil.rmtree(path, ignore_errors=True)

    ds = MdioDataset.from_json(SPEC, path)
    print("created:", ds.list_variables(), "domain:", ds.domain())

    # write the image via the distributed chunk-aligned writer
    cells = dense_fill_frame(spark, (128, 96), ["inline", "crossline"], 0.0).withColumn(
        "value", (F.col("inline") * 96 + F.col("crossline")).cast("float")
    )
    report = ds.var("image").write_df(cells)
    print("write report:", report)

    # reopen and read a slice back (lazy isel → pruned scan)
    re = MdioDataset.open(path)
    sliced = re.isel(inline=(10, 14), crossline=(0, 3)).to_df(spark, "image")
    sliced.orderBy("inline", "crossline").show(12)
    print("planned chunks for the slice:", re.isel(inline=(10, 14), crossline=(0, 3)).var("image").planned_chunks(),
          "of", re.var("image").planned_chunks())


if __name__ == "__main__":
    main()
