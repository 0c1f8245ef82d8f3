"""Distributed store transcode: copy an array into a new store under a
different chunk codec — the codec-migration primitive (e.g. a blosc-zlib
store from the reference's writer re-encoded to plain zlib/gzip, or vice
versa).

Scale design: the chunk grid is IDENTICAL on both sides, so the copy is
embarrassingly parallel — one lazy ``spark.range`` over chunk ids, each
task decode→re-encode→writes the same coordinates in the destination.
ZERO shuffle, zero driver materialization: at 100 TB this is pure
bandwidth, the plan you want for a fleet-wide codec migration. Fill-only
(absent) chunks are skipped — sparsity survives the copy for free.

The reference has no transcode (codec is fixed at dataset creation,
dataset_factory.h:295-346); migrating means a full app-side rewrite.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from mdio_cpp_spark.sources.zarr_store import ZarrStore


def transcode_array(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    var: str,
    compressor: dict | None,
    chunks_per_task: int = 8,
) -> dict:
    """Copy ``var`` from ``src_root`` into ``dst_root`` re-encoded with
    ``compressor`` (v2 compressor JSON; None = raw). The destination store
    is created if absent; the array is declared with the source's shape /
    chunks / dtype / dims / fill / attrs. Returns
    {chunks_total, chunks_copied} — the difference is fill-only chunks
    that cost nothing on either side."""
    src = ZarrStore.open(src_root)
    meta = src.array_meta(var)
    try:
        dst = ZarrStore.open(dst_root)
    except FileNotFoundError:
        dst = ZarrStore.create(dst_root, version=2, attrs=dict(src.attrs))
    if var not in dst.arrays():
        dst.create_array(
            var, shape=meta.shape, chunks=meta.chunks, dtype=meta.np_dtype,
            dims=meta.dims, attrs=dict(meta.attrs), compressor=compressor,
            fill=meta.fill,
        )
        dst.consolidate()

    n = meta.nchunks()
    grid = meta.grid_shape()
    src_path, src_ver = src.root, src.version
    dst_path, dst_ver = dst.root, dst.version

    def copy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s = ZarrStore(src_path, src_ver)
        d = ZarrStore(dst_path, dst_ver)
        sm = s.array_meta(var)
        dm = d.array_meta(var)
        for pdf in batches:
            copied = 0
            for linear in pdf["id"].to_numpy():
                coords = tuple(int(c) for c in np.unravel_index(int(linear), grid))
                block = s.decode_chunk(sm, coords)
                if block is None:
                    continue  # fill-only: sparsity survives for free
                d.write_chunk(dm, coords, block)
                copied += 1
            yield pd.DataFrame({"n": [len(pdf)], "copied": [copied]})

    par = max(1, spark.sparkContext.defaultParallelism)
    n_parts = min(max(1, math.ceil(n / max(1, chunks_per_task))), 64 * par)
    row = (
        spark.range(n, numPartitions=n_parts)
        .mapInPandas(copy, "n long, copied long")
        .groupBy()
        .sum("n", "copied")
        .collect()[0]
    )
    return {"chunks_total": int(row[0] or 0), "chunks_copied": int(row[1] or 0)}
