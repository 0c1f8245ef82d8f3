"""Zarr v2/v3 format layer + Spark scan/write paths (SURVEY M4/M5).

Layout:
  codecs     — per-chunk compression (null/zlib/gzip stdlib; blosc gated)
  zarr_store — pure-Python store: metadata read/write, version probe,
               consolidated metadata, chunk get/put (IO1/IO2/IO7 plumbing)
  reader     — Spark chunk-manifest scan with chunk pruning + fill synthesis
               (IO1/IO3/IO4)
  writer     — Spark chunk-aligned writer (IO2/IO5/IO6)
  multimodal — binary-column (image/audio) plumbing with stubbed decoders

The pure-Python store is deliberately independent of the Spark paths so the
two can act as differential oracles for each other (the reference's own
cross-implementation test trick, SURVEY §5).
"""

from mdio_cpp_spark.sources.zarr_store import ZarrArrayMeta, ZarrStore  # noqa: F401
