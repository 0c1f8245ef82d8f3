"""`spark.read.format("mdio")` — a PySpark Python Data Source for Zarr/MDIO.

The most idiomatic packaging of the scan path (SURVEY §2.1 IO1/IO4): the
reader participates in Catalyst planning directly —

  * ``schema()`` — driver-side metadata read → long-form schema
    ``(dims…, value)`` (one consolidated-metadata read, zarr_v2.h:467-482).
  * ``pushFilters()`` — Catalyst hands the reader its predicates; filters on
    DIMENSION columns (=, <, <=, >, >=) are CONSUMED and become half-open
    index ranges that drive chunk pruning — the custom piece Catalyst can't
    do itself (SURVEY §4). Filters on the value column are returned
    unconsumed (Spark re-applies them; numpy and Spark disagree on NaN
    comparison semantics, so consuming them would be subtly wrong —
    ``scan_array(value_filter=…)`` exists for callers who accept numpy
    semantics).
  * ``partitions()`` — one InputPartition per pruned chunk; Spark schedules
    them like any other source's splits.
  * ``read()`` — executors decode chunks to Arrow RecordBatches (zero
    Python-object rows on the hot path); absent chunks synthesize fill.

Usage:
    from mdio_cpp_spark.sources.datasource import register
    register(spark)
    df = (spark.read.format("mdio")
          .option("path", "/data/campos_3d.zarr").option("variable", "image")
          .load().filter("inline >= 100 AND inline < 200"))
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from mdio_cpp_spark.sources.reader import _decode_chunk_to_pdf, _dim_names, scan_schema
from mdio_cpp_spark.sources.zarr_store import ZarrStore, _clamped_box


class MdioChunkPartition(InputPartition):
    """A contiguous RANGE of linear chunk ids within the pruned grid — one
    partition object per task, not per chunk, so a petascale array (millions
    of chunks) plans thousands of partitions, each decoding a slice of the
    grid. (grid_starts, grid_lens) define the pruned per-dim chunk ranges;
    linear ids unravel C-order within that grid."""

    def __init__(self, start: int, end: int, grid_starts: tuple[int, ...], grid_lens: tuple[int, ...]):
        self.start = start
        self.end = end
        self.grid_starts = grid_starts
        self.grid_lens = grid_lens

    def coords_iter(self):
        for linear in range(self.start, self.end):
            rem, coords = linear, []
            for length in reversed(self.grid_lens):
                coords.append(rem % length)
                rem //= length
            yield tuple(
                self.grid_starts[d] + c for d, c in enumerate(reversed(coords))
            )


class MdioDataSource(DataSource):
    """format("mdio") — options: path (store root), variable (array name),
    value_col (default 'value'), fields (comma-separated struct fields)."""

    @classmethod
    def name(cls) -> str:
        return "mdio"

    def _meta(self):
        path = self.options.get("path")
        var = self.options.get("variable")
        if not path or not var:
            raise ValueError("format('mdio') requires .option('path', …) and .option('variable', …)")
        store = ZarrStore.open(path)
        return store, store.array_meta(var)

    def schema(self) -> StructType:
        _, meta = self._meta()
        fields = self.options.get("fields")
        return scan_schema(
            meta,
            fields.split(",") if fields else None,
            self.options.get("value_col", "value"),
        )

    def reader(self, schema: StructType) -> "MdioReader":
        store, meta = self._meta()
        return MdioReader(store, meta, self.options)


class MdioReader(DataSourceReader):
    def __init__(self, store: ZarrStore, meta, options):
        self.root = store.root
        self.version = store.version
        self.meta = meta
        self.value_col = options.get("value_col", "value")
        fields = options.get("fields")
        self.fields = fields.split(",") if fields else (
            list(meta.np_dtype.names) if meta.is_struct else None
        )
        self.dim_names = _dim_names(meta)
        # accumulated half-open bounds per dim, refined by pushFilters
        self._bounds: dict[str, list[int]] = {
            d: [0, meta.shape[i]] for i, d in enumerate(self.dim_names)
        }

    # -------------------------------------------------------------- pushdown

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume dim-column comparisons (they become exact chunk-pruning
        ranges); yield back everything else for Spark to evaluate."""
        for f in filters:
            consumed = False
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col in self._bounds and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and isinstance(f.value, (int, np.integer)):
                lo, hi = self._bounds[col]
                v = int(f.value)
                if isinstance(f, EqualTo):
                    lo, hi = max(lo, v), min(hi, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    lo = max(lo, v)
                elif isinstance(f, GreaterThan):
                    lo = max(lo, v + 1)
                elif isinstance(f, LessThan):
                    hi = min(hi, v)
                elif isinstance(f, LessThanOrEqual):
                    hi = min(hi, v + 1)
                self._bounds[col] = [lo, hi]
                consumed = True
            if not consumed:
                yield f

    def _box(self):
        return _clamped_box(
            self.meta, {d: (lo, hi) for d, (lo, hi) in self._bounds.items()}
        )

    # ------------------------------------------------------------- planning

    def partitions(self, chunks_per_task: int = 4, max_tasks: int | None = None) -> list[MdioChunkPartition]:
        # scale the split cap with the cluster (same rule as reader.py's
        # scan cap): 64 tasks per core keeps a petascale array's task count
        # bounded WITHOUT capping a 1000-executor cluster at a constant —
        # planning runs on the driver, so the active session is available
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        par = max(1, active.sparkContext.defaultParallelism if active else 64)
        if max_tasks is None:
            max_tasks = 64 * par
        box = self._box()
        if any(hi <= lo for lo, hi in box):
            return []
        per_dim = [
            range(box[d][0] // self.meta.chunks[d], (box[d][1] - 1) // self.meta.chunks[d] + 1)
            for d in range(self.meta.ndim)
        ]
        grid_starts = tuple(r.start for r in per_dim)
        grid_lens = tuple(len(r) for r in per_dim)
        n_chunks = 1
        for length in grid_lens:
            n_chunks *= length
        # never fewer tasks than cores while chunks remain (small scans
        # should still use the whole cluster)
        n_parts = max(1, -(-n_chunks // chunks_per_task))
        n_parts = min(max(n_parts, min(n_chunks, par)), max_tasks)
        per_part = -(-n_chunks // n_parts)
        return [
            MdioChunkPartition(s, min(s + per_part, n_chunks), grid_starts, grid_lens)
            for s in range(0, n_chunks, per_part)
        ]

    # -------------------------------------------------------------- execute

    def read(self, partition: MdioChunkPartition) -> Iterator[pa.RecordBatch]:
        if partition is None:  # empty selection: partitions() returned []
            return
        store = ZarrStore(self.root, self.version)
        box = self._box()
        steps = tuple(1 for _ in self.dim_names)
        for coords in partition.coords_iter():
            pdf = _decode_chunk_to_pdf(
                store, self.meta, coords, box, steps,
                self.dim_names, self.fields, self.value_col,
            )
            yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)


def register(spark) -> None:
    """Register the mdio format on a session (idempotent)."""
    spark.dataSource.register(MdioDataSource)
