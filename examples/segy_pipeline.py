"""SEG-Y round trip: acquisition file → QC → PostStack3D store → export.

The reference's real-data workflow (regression_tests/
multidimio_compatibility_test.py) ingests a SEG-Y into the store and
reads it back; this example runs the whole loop wheel-free and adds the
pre-ingest QC pass and the export leg the reference lacks:

  1. synthesize a small rev1 file (IBM floats, inline/crossline headers),
  2. header QC straight off the file through format("segy") + SQL,
  3. ingest onto the (inline, crossline, sample) cube,
  4. pruned isel box over the stored cube,
  5. export back to SEG-Y and verify the samples survived bit-exactly.

Run: python examples/segy_pipeline.py
"""

from __future__ import annotations

import os
import struct
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

from mdio_cpp_spark.model import MdioDataset
from mdio_cpp_spark.session import get_spark
from mdio_cpp_spark.sources.segy import (
    export_segy,
    ingest_to_store,
    register_segy,
    scan_traces,
)


def synth_segy(path: str, n_il: int = 8, n_xl: int = 10, ns: int = 12) -> np.ndarray:
    """Handcrafted rev1 file; returns the (il, xl, sample) truth cube."""
    cube = np.fromfunction(lambda i, x, s: (i * 997 + x * 31 + s) % 4096,
                           (n_il, n_xl, ns))
    out = bytearray()
    out += "C 1 segy_pipeline example".ljust(3200).encode("ascii")
    bh = bytearray(400)
    struct.pack_into(">h", bh, 16, 4000)
    struct.pack_into(">h", bh, 20, ns)
    struct.pack_into(">h", bh, 24, 1)  # IBM float
    struct.pack_into(">h", bh, 300, 0x0100)
    struct.pack_into(">h", bh, 302, 1)
    out += bh
    from mdio_cpp_spark.sources.segy import ieee_to_ibm

    flat = cube.reshape(-1, ns)
    for t in range(flat.shape[0]):
        th = bytearray(240)
        struct.pack_into(">i", th, 0, t + 1)
        struct.pack_into(">h", th, 114, ns)
        struct.pack_into(">i", th, 188, 100 + t // n_xl)
        struct.pack_into(">i", th, 192, 200 + t % n_xl)
        out += th
        out += ieee_to_ibm(flat[t]).astype(">u4").tobytes()
    with open(path, "wb") as f:
        f.write(out)
    return cube


def main() -> None:
    spark = get_spark("segy-pipeline-example", master="local[4]")
    d = tempfile.mkdtemp(prefix="segy_example_")
    sgy = os.path.join(d, "survey.sgy")
    cube = synth_segy(sgy)

    # 2. header QC via the DSv2 source + SQL
    register_segy(spark)
    (
        spark.read.format("segy").option("path", sgy)
        .option("header_fields", "inline:189,crossline:193")
        .option("with_samples", "false").load()
        .createOrReplaceTempView("traces")
    )
    print("== per-inline trace QC ==")
    spark.sql("""
        SELECT inline, COUNT(*) AS traces,
               MIN(crossline) AS xl_lo, MAX(crossline) AS xl_hi
        FROM traces GROUP BY inline ORDER BY inline
    """).show(4)

    # 3. ingest onto the cube
    root = os.path.join(d, "cube.zarr")
    rep = ingest_to_store(spark, sgy, root, grid_by=("inline", "crossline"))
    print("ingest report:", rep)

    # 4. pruned isel box over the stored cube
    ds = MdioDataset.open(root)
    box = ds.isel(inline=(2, 5), crossline=(3, 7)).to_df(
        spark, "amplitude", value_col="v")
    print("== stored-cube box ==")
    box.orderBy("inline", "crossline", "sample").show(4)

    # 5. export back to SEG-Y, verify bit-exact samples
    out = os.path.join(d, "exported.sgy")
    export_segy(spark, root, "amplitude", out, fmt=1)
    back = scan_traces(spark, out).collect()
    flat = cube.reshape(-1, cube.shape[-1])
    ok = all(np.array_equal(np.asarray(r["samples"]), flat[r["trace"]])
             for r in back)
    print(f"export round-trip bit-exact over {len(back)} traces: {ok}")
    assert ok
    spark.stop()


if __name__ == "__main__":
    main()
