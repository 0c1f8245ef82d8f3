"""Chunk-level zone maps: per-chunk min/max statistics used to prune
value-predicate scans before any chunk bytes are read.

The parquet row-group statistics idea applied to the Zarr chunk grid. The
reference stores whole-VARIABLE statsV1 (stats.h:229-335, schema
dataset_schema.h) — one histogram/min/max per array; a zone map is the same
contract at chunk granularity, which is what makes it a *pruning* structure
rather than a summary. Stored in the array's attributes (travels with the
store, readable by any zarr client as plain JSON) under ``mdio:chunk_stats``.

Scale design:
  * build — one distributed pass, one output row PER CHUNK (never per cell):
    a 100 TB / 1 MB-chunk array yields ~100 M tiny rows at most; at that
    size the manifest belongs in its own sidecar array, so ``build`` caps
    attr-resident manifests and refuses beyond it (the honest gate).
  * prune — two tiers. Driver-side: when the (already range-pruned) chunk
    grid is small enough to enumerate, the surviving linear ids ship as the
    task list, so skipped chunks never even become work. Executor-side:
    otherwise each task consults the manifest (already on every executor via
    the meta closure — no extra I/O) and skips incompatible chunks BEFORE
    the byte read — the decode, the decompress, and the kvstore GET all
    disappear, which at cloud-storage latency is the entire cost.

Fill-only chunks (no stored bytes) carry ``null`` stats; the reader's
existing fill-vs-predicate logic handles them.
"""

from __future__ import annotations

from typing import Any, Iterator

import math

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from mdio_cpp_spark.sources.zarr_store import CHUNK_STATS_ATTR, ZarrArrayMeta, ZarrStore, zone_of

STATS_KEY = CHUNK_STATS_ATTR

# attr-resident manifest cap: beyond this, stats belong in a sidecar array
MAX_ATTR_CHUNKS = 262_144

_FLOAT_MAX = float(np.finfo(np.float64).max)

# driver-side enumeration cap for exact pruning (beyond it, executor-side
# skip does the same work without a driver loop)
MAX_DRIVER_ENUM = 65_536


def _coords_key(coords: tuple[int, ...]) -> str:
    return ",".join(str(c) for c in coords)


def compute_chunk_stats(
    spark: SparkSession, root: str, var: str, chunks_per_task: int = 8
) -> dict[str, list[float] | None]:
    """Distributed per-chunk [min, max] over the VALID extent of each chunk
    (edge padding excluded). One Spark job, one row per chunk."""
    store = ZarrStore.open(root)
    meta = store.array_meta(var)
    if meta.is_struct or meta.np_dtype.kind not in "biuf":
        raise ValueError("zone maps apply to scalar numeric/bool arrays only")
    if meta.nchunks() > MAX_ATTR_CHUNKS:
        raise ValueError(
            f"{meta.nchunks()} chunks exceeds the attr-resident manifest cap "
            f"({MAX_ATTR_CHUNKS}); store the manifest as a sidecar array instead"
        )
    grid = meta.grid_shape()
    shape, chunks = meta.shape, meta.chunks
    root_path, version = store.root, store.version
    import math

    par = max(1, spark.sparkContext.defaultParallelism)
    n_parts = min(max(1, math.ceil(meta.nchunks() / max(1, chunks_per_task))), 64 * par)

    def stat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ts = ZarrStore(root_path, version)
        m = ts.array_meta(var)
        for pdf in batches:
            rows = []
            for linear in pdf["id"].to_numpy():
                coords = tuple(int(c) for c in np.unravel_index(int(linear), grid))
                block = ts.decode_chunk(m, coords)
                key = _coords_key(coords)
                if block is None:
                    rows.append((key, None, None))
                    continue
                valid = tuple(
                    slice(0, min(chunks[d], shape[d] - coords[d] * chunks[d]))
                    for d in range(len(shape))
                )
                z = zone_of(block[valid])
                rows.append((key, None, None) if z is None else (key, z[0], z[1]))
            yield pd.DataFrame(rows, columns=["key", "vmin", "vmax"])

    rows = (
        spark.range(meta.nchunks(), numPartitions=n_parts)
        .mapInPandas(stat, "key string, vmin double, vmax double")
        .collect()
    )
    return {
        r["key"]: (None if r["vmin"] is None else [r["vmin"], r["vmax"]]) for r in rows
    }


def publish_chunk_stats(root: str, var: str, stats: dict) -> None:
    """Attach the manifest to the array's attributes and republish metadata
    (the reference's PublishMetadata shape, variable.h:1522-1614)."""
    from mdio_cpp_spark.model import MdioDataset

    ds = MdioDataset.open(root)
    ds.update_attrs(var, **{STATS_KEY: stats})
    ds.commit_metadata()


def ensure_chunk_stats(spark: SparkSession, root: str, var: str) -> dict:
    """Build+publish the manifest once; reopen-safe and idempotent."""
    meta = ZarrStore.open(root).array_meta(var)
    existing = meta.attrs.get(STATS_KEY)
    if existing is not None:
        return existing
    stats = compute_chunk_stats(spark, root, var)
    publish_chunk_stats(root, var, stats)
    return stats


def chunk_compatible(
    stats: list[float] | None, op: str, lit: Any, fill: Any,
    float_kind: bool = False,
) -> bool:
    """Can a chunk with zone [lo, hi] contain a row satisfying ``op lit``?
    ``None`` stats = fill-only chunk → evaluate the fill value itself.

    Soundness guards (pruning may only drop chunks that PROVABLY contain no
    matching row): an infinite/boundary literal never prunes (zones clamp
    ±inf into the finite range for JSON, so a clamped hi cannot be compared
    against lit=+inf); on float arrays ``!=`` never prunes (the zone masks
    NaN cells — which DO satisfy any != — so a constant-looking zone can
    still hide matching NaN rows)."""
    try:
        if lit is None or not math.isfinite(float(lit)):
            return True
    except (TypeError, ValueError, OverflowError):
        return True
    if abs(float(lit)) >= _FLOAT_MAX:
        return True  # clamped-zone territory: cannot distinguish inf from max
    if stats is None:
        if fill is None:
            return True
        lo = hi = fill
    else:
        lo, hi = stats
    if op == ">=":
        return hi >= lit
    if op == ">":
        return hi > lit
    if op == "<=":
        return lo <= lit
    if op == "<":
        return lo < lit
    if op == "==":
        return lo <= lit <= hi
    if op == "!=":
        if float_kind:
            return True  # zone masks NaN cells, which satisfy every !=
        return not (lo == hi == lit)
    return True  # unknown op: never prune


def load_stats(meta: ZarrArrayMeta) -> dict | None:
    return meta.attrs.get(STATS_KEY)


def aggregate_from_manifest(meta: ZarrArrayMeta) -> tuple[int, float, float] | None:
    """Answer (count, min, max) of a FULLY-WRITTEN array from its manifest
    alone — O(n_chunks) driver arithmetic, zero chunk reads (the stats-only
    aggregate every warehouse pulls from footer metadata). Returns None
    when the manifest is absent, incomplete, or any chunk is fill-only
    (fill values — often NaN — need real decode semantics)."""
    stats = load_stats(meta)
    if stats is None or len(stats) != meta.nchunks():
        return None
    zones = list(stats.values())
    if any(z is None for z in zones):
        return None
    count = int(np.prod(meta.shape))
    return count, min(z[0] for z in zones), max(z[1] for z in zones)
