"""streaming_ingest — Structured Streaming micro-batches into a Zarr store.

Creates an array, streams the events table into it as micro-batches
(availableNow), and reads the result back through the distributed scan. Run:

    python examples/streaming_ingest.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from mdio_cpp_spark.catalog import table
from mdio_cpp_spark.session import get_spark
from mdio_cpp_spark.sources.reader import scan_array
from mdio_cpp_spark.sources.zarr_store import ZarrStore
from mdio_cpp_spark.streaming.ingest import stream_write_array


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-ingest")
    work = tempfile.mkdtemp(prefix="mdio_ingest_")
    try:
        # stage the events as a file stream source
        src = f"{work}/src"
        ev = table(spark, sf_dir, "events").select(
            F.col("event_id").alias("i"), F.col("value").alias("value")
        )
        n = ev.count()
        ev.repartition(4).write.parquet(src)

        root = f"{work}/events.zarr"
        st = ZarrStore.create(root, version=2)
        st.create_array("value", shape=(n,), chunks=(4096,), dtype="float64",
                        dims=("i",), compressor={"id": "zlib", "level": 3})
        st.consolidate()

        stream = (
            spark.readStream.schema("i long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_write_array(stream, root, "value", checkpoint=f"{work}/ckpt")
        q.awaitTermination(300)
        print(f"ingested {n} events in micro-batches")

        back = scan_array(spark, root, "value", ranges={"i": (0, 10)})
        back.orderBy("i").show()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
