"""seismic_reader — volume statistics + peak/trough location on a 3-D store.

Mirrors the reference's examples/seismic_reader (main.cc:40-127): open a 3-D
seismic-like dataset, print coordinate extents, compute volume statistics,
locate the peak and trough amplitudes, and `sel` the dataset down to those
coordinates. The volume here is synthetic (a deterministic wave pattern)
since the real Teapot Dome SEG-Y needs network access. Run:

    python examples/seismic_reader.py
"""

from __future__ import annotations

import shutil
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pyspark.sql.functions as F

from mdio_cpp_spark.model import MdioDataset
from mdio_cpp_spark.session import get_spark

IL, XL, Z = 64, 64, 48  # inline × crossline × depth (campos_3d shape, scaled down)

SPEC = {
    "metadata": {"name": "seismic_example", "apiVersion": "1.0.0"},
    "variables": [
        {"name": "stack", "dataType": "float32",
         "dimensions": [{"name": "inline", "size": IL},
                        {"name": "crossline", "size": XL},
                        {"name": "depth", "size": Z}],
         "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [32, 32, 32]}}},
         "coordinates": ["inline", "crossline", "depth"]},
        {"name": "inline", "dataType": "int32", "dimensions": [{"name": "inline", "size": IL}]},
        {"name": "crossline", "dataType": "int32", "dimensions": [{"name": "crossline", "size": XL}]},
        {"name": "depth", "dataType": "int32", "dimensions": [{"name": "depth", "size": Z}]},
    ],
}


def main() -> None:
    spark = get_spark("seismic-reader", master="local[8]")
    path = "/root/repo/.zarr_cache/_example_seismic.zarr"
    shutil.rmtree(path, ignore_errors=True)

    ds = MdioDataset.from_json(SPEC, path)
    # label the dimension coordinates like a real survey (inline 100.., xline 300..)
    ds.store.write_array_numpy("inline", np.arange(100, 100 + IL, dtype="i4"))
    ds.store.write_array_numpy("crossline", np.arange(300, 300 + XL, dtype="i4"))
    ds.store.write_array_numpy("depth", np.arange(0, Z * 4, 4, dtype="i4"))
    # synthetic amplitude volume with a known peak and trough
    il, xl, z = np.meshgrid(np.arange(IL), np.arange(XL), np.arange(Z), indexing="ij")
    vol = (np.sin(il / 7.0) * np.cos(xl / 5.0) * np.sin(z / 3.0)).astype("f4")
    vol[40, 10, 20] = 3.5   # peak
    vol[5, 50, 33] = -4.2   # trough
    ds.store.write_array_numpy("stack", vol)
    ds.store.consolidate()

    ds = MdioDataset.open(path)
    iv = {d: ds.var(d).read() for d in ("inline", "crossline", "depth")}
    print("inline extents:", iv["inline"].min(), "-", iv["inline"].max())
    print("crossline extents:", iv["crossline"].min(), "-", iv["crossline"].max())

    # volume statistics in one distributed pass (stats.h:229-335 contract)
    df = ds.to_df(spark, "stack")
    stats = df.agg(
        F.count("value").alias("count"),
        F.round(F.sum("value"), 3).alias("sum"),
        F.round(F.sum(F.col("value") * F.col("value")), 3).alias("sumSquares"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
    ).collect()[0]
    print("volume stats:", stats.asDict())

    # peak/trough tracking (examples/seismic_reader/main.cc:71-127): argmax
    # via TakeOrdered, then value-based sel to the survey coordinates
    peak = df.orderBy(F.col("value").desc(), "inline", "crossline", "depth").limit(1).collect()[0]
    trough = df.orderBy(F.col("value").asc(), "inline", "crossline", "depth").limit(1).collect()[0]
    for name, row in (("peak", peak), ("trough", trough)):
        il_val = int(iv["inline"][row["inline"]])
        xl_val = int(iv["crossline"][row["crossline"]])
        print(f"{name}: amplitude {row['value']:.2f} at inline {il_val}, crossline {xl_val}")
        located = ds.sel(inline=il_val, crossline=xl_val)
        spans = located.var("stack").get_intervals()
        print(f"  sel({il_val}, {xl_val}) -> index box {spans}")

    # survey geolocation (main.cc:31-53 + utm.hh): UTM extents of a cdp
    # grid → corner lat/lon → shareable geojson.io link. The conversion is
    # the shared SQL stage text (functions/geo.py) folded into the plan.
    from mdio_cpp_spark.functions.geo import apply_utm_stages

    cdp = spark.range(IL * XL).selectExpr(
        f"CAST(447000.0 + (id div {XL}) * 250.0 + (id % {XL}) * 25.0 AS DOUBLE) AS easting",
        f"CAST(7656000.0 + (id % {XL}) * 250.0 - (id div {XL}) * 25.0 AS DOUBLE) AS northing")
    bbox = apply_utm_stages(cdp).agg(
        F.round(F.min("lat"), 6).alias("lat_min"), F.round(F.max("lat"), 6).alias("lat_max"),
        F.round(F.min("lon"), 6).alias("lon_min"), F.round(F.max("lon"), 6).alias("lon_max"),
    ).collect()[0]
    print("survey lat/lon bbox:", bbox.asDict())

    # commit the stats into the store metadata (A6/IO7)
    ds.set_stats("stack", {k: (float(v) if v is not None else None) for k, v in stats.asDict().items()})
    ds.commit_metadata()
    print("statsV1 committed:", MdioDataset.open(path).var("stack").attrs["statsV1"]["count"])


if __name__ == "__main__":
    main()
