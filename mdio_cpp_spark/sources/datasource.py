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

from dataclasses import dataclass
from typing import Any, Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from mdio_cpp_spark.sources import zonemap as _zonemap
from mdio_cpp_spark.sources.reader import (
    _VALUE_OPS,
    _decode_chunk_to_pdf,
    _dim_names,
    scan_schema,
)
from mdio_cpp_spark.sources.zarr_store import CHUNK_STATS_ATTR, ZarrStore, _clamped_box, zone_of


class MdioChunkPartition(InputPartition):
    """A contiguous RANGE of linear chunk ids within the pruned grid — one
    partition object per task, not per chunk, so a petascale array (millions
    of chunks) plans thousands of partitions, each decoding a slice of the
    grid. (grid_starts, grid_lens) define the pruned per-dim chunk ranges;
    linear ids unravel C-order within that grid."""

    def __init__(self, start: int, end: int, grid_starts: tuple[int, ...], grid_lens: tuple[int, ...],
                 ids: tuple[int, ...] | None = None,
                 dim_chunks: tuple[tuple[int, ...], ...] | None = None):
        self.start = start
        self.end = end
        self.grid_starts = grid_starts
        self.grid_lens = grid_lens
        # explicit survivor ids (driver-tier zone pruning); None = the
        # contiguous [start, end) range
        self.ids = ids
        # non-contiguous per-dim chunk indices (an In-filtered dim); None =
        # contiguous ranges described by (grid_starts, grid_lens). Bounded
        # by the In list's length, so the per-partition pickle stays tiny.
        self.dim_chunks = dim_chunks

    def coords_iter(self):
        linears = self.ids if self.ids is not None else range(self.start, self.end)
        if self.dim_chunks is not None:
            lens = [len(c) for c in self.dim_chunks]
            for linear in linears:
                rem, idx = linear, []
                for length in reversed(lens):
                    idx.append(rem % length)
                    rem //= length
                yield tuple(
                    self.dim_chunks[d][c] for d, c in enumerate(reversed(idx))
                )
            return
        for linear in linears:
            rem, coords = linear, []
            for length in reversed(self.grid_lens):
                coords.append(rem % length)
                rem //= length
            yield tuple(
                self.grid_starts[d] + c for d, c in enumerate(reversed(coords))
            )


class MdioDataSource(DataSource):
    """format("mdio") — options: path (store root), variable (array name),
    value_col (default 'value'), fields (comma-separated struct fields).
    ALTERNATIVE: variables (comma-separated 'var' / 'var.field' entries) —
    the fused aligned multi-variable scan (one task decodes every listed
    variable's chunk at the same coords; no join, no shuffle). Output
    columns are the field name for 'var.field' entries, else the variable
    name; all listed variables must share dims/shape/chunks."""

    @classmethod
    def name(cls) -> str:
        return "mdio"

    def _parse_path(self) -> str:
        path = self.options.get("path")
        if not path:
            return path
        if path.startswith("file://"):
            return path[len("file://"):]
        if path.startswith("file:"):
            return path[len("file:"):]
        return path

    def _aligned_specs(self):
        """[(var, field|None, out_col)] from the ``variables`` option, or
        None when the option is absent."""
        raw = self.options.get("variables")
        if not raw:
            return None
        specs = []
        for entry in raw.split(","):
            entry = entry.strip()
            if "." in entry:
                vname, field = entry.split(".", 1)
                specs.append((vname, field, field))
            else:
                specs.append((entry, None, entry))
        return specs

    def _meta(self):
        path = self._parse_path()
        var = self.options.get("variable")
        specs = self._aligned_specs()
        if path and specs and not var:
            store = ZarrStore.open(path)
            return store, store.array_meta(specs[0][0])
        if not path or not var:
            raise ValueError(
                "format('mdio') requires .option('path', …) and "
                ".option('variable', …). Note: catalog-persisted tables "
                "(CREATE TABLE … USING mdio) are not supported — Spark's "
                "Python Data Source API hands persisted tables an empty "
                "options map; register a temp view over read.format('mdio') "
                "instead (the zarr18 SQL route)."
            )
        store = ZarrStore.open(path)
        return store, store.array_meta(var)

    def schema(self) -> StructType:
        store, meta = self._meta()
        specs = self._aligned_specs()
        if specs and not self.options.get("variable"):
            from pyspark.sql.types import LongType, StructField

            from mdio_cpp_spark.sources.reader import _scalar_spark_type

            out = [StructField(d, LongType(), False) for d in _dim_names(meta)]
            for vname, field, out_col in specs:
                m = store.array_meta(vname)
                if m.np_dtype.kind == "c":
                    raise ValueError(f"complex variable {vname!r} is not fusable")
                if field is None and m.is_struct:
                    raise ValueError(
                        f"struct variable {vname!r} needs '{vname}.<field>'"
                    )
                if (m.shape, m.chunks, tuple(m.dims)) != (
                    meta.shape, meta.chunks, tuple(meta.dims)
                ):
                    raise ValueError(
                        f"variables must share one grid: {vname!r} has "
                        f"{m.shape}/{m.chunks}/{m.dims}, expected "
                        f"{meta.shape}/{meta.chunks}/{meta.dims}"
                    )
                dt = m.np_dtype.fields[field][0] if field else m.np_dtype
                out.append(StructField(out_col, _scalar_spark_type(dt), True))
            return StructType(out)
        fields = self.options.get("fields")
        return scan_schema(
            meta,
            fields.split(",") if fields else None,
            self.options.get("value_col", "value"),
        )

    def reader(self, schema: StructType) -> "MdioReader":
        store, meta = self._meta()
        specs = self._aligned_specs()
        if specs and not self.options.get("variable"):
            return MdioAlignedReader(store, specs, self.options)
        return MdioReader(store, meta, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "MdioArrowWriter":
        if self._aligned_specs() and not self.options.get("variable"):
            raise ValueError("the 'variables' option is read-only; write one "
                             "variable at a time (or use write_arrays for a "
                             "fused multi-variable write)")
        if overwrite:
            raise ValueError("format('mdio') writes are append/RMW only; "
                             "use TrimDataset/DeleteDataset for destructive ops")
        store, meta = self._meta()
        return MdioArrowWriter(
            store.root, store.version, meta.name,
            self.options.get("value_col", "value"),
        )

    def streamWriter(self, schema: StructType, overwrite: bool) -> "MdioStreamArrowWriter":
        if overwrite:
            raise ValueError(
                "format('mdio') streaming writes are append/RMW only — "
                "outputMode('complete') (truncate-per-batch) is not supported; "
                "use update/append output modes"
            )
        store, meta = self._meta()
        return MdioStreamArrowWriter(
            store.root, store.version, meta.name,
            self.options.get("value_col", "value"),
        )

    def streamReader(self, schema: StructType) -> "MdioStreamReader":
        store, meta = self._meta()
        return MdioStreamReader(store.root, store.version, meta.name, self.options)


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
        # value-column comparisons consumed by pushFilters: evaluated
        # exactly in the decoder (numpy, before the Arrow boundary) and —
        # when the array carries zone-map stats — used to SKIP incompatible
        # chunks before the byte GET (sources/zonemap.py). Ops: the five
        # comparisons, plus "in" (tuple payload), "isnull", "notnull".
        self._value_filters: list[tuple[str, Any]] = []
        # In-sets on dimension columns: exact scattered-index selection —
        # chunks prune to those containing a member, rows mask to members
        self._dim_in: dict[str, tuple[int, ...]] = {}

    # -------------------------------------------------------------- pushdown

    _VF_OPS = {
        EqualTo: "==",
        # null-safe equality to a NON-NULL literal is plain equality on the
        # scan output (a NULL literal fails the numeric-literal guard below)
        EqualNullSafe: "==",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }

    @staticmethod
    def _is_num(v) -> bool:
        return (
            isinstance(v, (int, float, np.integer, np.floating))
            and not isinstance(v, bool)
            and not (isinstance(v, (float, np.floating)) and np.isnan(v))
        )

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume dim-column comparisons and In-sets (exact chunk-pruning
        ranges / scattered-index lists) AND value-column comparisons, In,
        IS [NOT] NULL (decoder-exact, zone-map-prunable); yield back
        everything else for Spark to evaluate."""
        value_pushable = (
            not self.meta.is_struct
            and self.meta.np_dtype.kind in "iuf"
            # uint64 surfaces as Decimal(20,0) — object cells, not a numpy
            # comparison target; leave its predicates to Spark
            and self.meta.np_dtype.name != "uint64"
        )
        for f in filters:
            consumed = False
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col in self._bounds and isinstance(f, In) and all(
                isinstance(v, (int, np.integer)) and not isinstance(v, bool)
                for v in f.value
            ):
                new = tuple(sorted({int(v) for v in f.value}))
                old = self._dim_in.get(col)
                self._dim_in[col] = (
                    new if old is None else tuple(sorted(set(old) & set(new)))
                )
                consumed = True
            elif col in self._bounds and isinstance(f, IsNotNull):
                consumed = True  # dimension indices are never null
            elif value_pushable and col == self.value_col and isinstance(f, In) and all(
                self._is_num(v) for v in f.value
            ):
                lits = tuple(
                    int(v) if isinstance(v, (int, np.integer)) else float(v)
                    for v in f.value
                )
                self._value_filters.append(("in", lits))
                consumed = True
            elif value_pushable and col == self.value_col and isinstance(f, IsNotNull):
                # NaN cells surface as NULL at the Arrow boundary — the
                # decoder mask is ~isnan (ints/bools are never null)
                self._value_filters.append(("notnull", None))
                consumed = True
            elif value_pushable and col == self.value_col and isinstance(f, IsNull):
                self._value_filters.append(("isnull", None))
                consumed = True
            elif col in self._bounds and isinstance(
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
            elif (
                value_pushable
                and col == self.value_col
                and type(f) in self._VF_OPS
                and isinstance(f.value, (int, float, np.integer, np.floating))
                and not isinstance(f.value, bool)
                and not (isinstance(f.value, (float, np.floating)) and np.isnan(f.value))
            ):
                # consumed = Spark will NOT re-check: the decoder's numpy
                # mask reproduces the predicate exactly on the scan's output
                # domain (NaN cells surface as NULL at the Arrow boundary,
                # and NULL fails every comparison — numpy's NaN behavior);
                # NaN literals stay with Spark. Int literals keep their
                # native type — float() would lose exactness past 2^53 on
                # int64 columns
                lit = (
                    int(f.value)
                    if isinstance(f.value, (int, np.integer))
                    else float(f.value)
                )
                self._value_filters.append((self._VF_OPS[type(f)], lit))
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
        per_dim: list = []
        irregular = False
        for d in range(self.meta.ndim):
            name = self.dim_names[d]
            lo, hi = box[d]
            if name in self._dim_in:
                # scattered-index selection: only chunks containing a member
                # (bounded by the In list's length, never the grid's)
                members = [v for v in self._dim_in[name] if lo <= v < hi]
                if not members:
                    return []
                per_dim.append(tuple(sorted({v // self.meta.chunks[d] for v in members})))
                irregular = True
            else:
                per_dim.append(
                    range(lo // self.meta.chunks[d], (hi - 1) // self.meta.chunks[d] + 1)
                )
        grid_starts = tuple(r.start if isinstance(r, range) else 0 for r in per_dim)
        grid_lens = tuple(len(r) for r in per_dim)
        dim_chunks = tuple(tuple(r) for r in per_dim) if irregular else None
        n_chunks = 1
        for length in grid_lens:
            n_chunks *= length
        # driver-tier zone pruning: with pushed value filters and an
        # enumerable grid, survivors ship as an explicit id list so skipped
        # chunks never even become work (reader.py's same two-tier rule;
        # past the enumeration cap the executor-side skip in read() does
        # the identical check without a driver loop)
        zk = self._zone_keeper()
        if zk is not None and n_chunks <= _zonemap.MAX_DRIVER_ENUM:
            import itertools

            survivors = tuple(
                i for i, coords in enumerate(itertools.product(*per_dim))
                if zk(coords)
            )
            if not survivors:
                return []
            n_parts = max(1, -(-len(survivors) // chunks_per_task))
            n_parts = min(max(n_parts, min(len(survivors), par)), max_tasks)
            per_part = -(-len(survivors) // n_parts)
            return [
                MdioChunkPartition(
                    0, 0, grid_starts, grid_lens,
                    ids=survivors[s : s + per_part],
                    dim_chunks=dim_chunks,
                )
                for s in range(0, len(survivors), per_part)
            ]
        # never fewer tasks than cores while chunks remain (small scans
        # should still use the whole cluster)
        n_parts = max(1, -(-n_chunks // chunks_per_task))
        n_parts = min(max(n_parts, min(n_chunks, par)), max_tasks)
        per_part = -(-n_chunks // n_parts)
        return [
            MdioChunkPartition(s, min(s + per_part, n_chunks), grid_starts, grid_lens,
                               dim_chunks=dim_chunks)
            for s in range(0, n_chunks, per_part)
        ]

    def _zone_keeper(self):
        """callable(chunk_coords) -> keep?, from the pushed value filters and
        the array's zone stats (attr manifest or sidecar); None when there is
        nothing to prune with. Built lazily on whichever side calls it — the
        driver for enumeration, each executor for the streamed skip."""
        if not self._value_filters:
            return None
        zone_src = _zonemap.open_zones(self.meta, self.root)
        if zone_src is None:
            return None
        try:
            fill = self.meta.fill_scalar()
        except Exception:
            fill = None
        float_kind = self.meta.np_dtype.kind == "f"
        vfs = list(self._value_filters)

        def keep(coords: tuple[int, ...]) -> bool:
            for op, lit in vfs:
                if op == "in":
                    # a chunk survives if ANY member could live in its zone;
                    # big lists skip the per-member walk (keep — sound)
                    if len(lit) <= 64 and not any(
                        _zonemap.zone_keep(zone_src, coords, "==", v, fill, float_kind)
                        for v in lit
                    ):
                        return False
                elif op in ("isnull", "notnull"):
                    continue  # zones track [min,max], not NaN presence
                elif not _zonemap.zone_keep(zone_src, coords, op, lit, fill, float_kind):
                    return False
            return True

        return keep

    # -------------------------------------------------------------- execute

    def read(self, partition: MdioChunkPartition) -> Iterator[pa.RecordBatch]:
        if partition is None:  # empty selection: partitions() returned []
            return
        store = ZarrStore(self.root, self.version)
        box = self._box()
        steps = tuple(1 for _ in self.dim_names)
        zk = self._zone_keeper()
        for coords in partition.coords_iter():
            if zk is not None and not zk(coords):
                continue  # zone-incompatible: no GET, no decompress, no decode
            pdf = _decode_chunk_to_pdf(
                store, self.meta, coords, box, steps,
                self.dim_names, self.fields, self.value_col,
            )
            for dim, members in self._dim_in.items():
                if len(pdf) == 0:
                    break
                pdf = pdf[np.isin(pdf[dim].to_numpy(), members)]
            for op, lit in self._value_filters:
                if len(pdf) == 0:
                    break
                # numpy semantics ARE the consumed-predicate semantics: NaN
                # cells surface as SQL NULL at the Arrow boundary (engine
                # convention), and NULL satisfies no comparison — exactly
                # numpy's False for every NaN comparison (and isin's)
                v = pdf[self.value_col].to_numpy()
                if op == "in":
                    mask = np.isin(v, lit)
                elif op == "notnull":
                    mask = ~np.isnan(v) if v.dtype.kind == "f" else np.ones(len(v), bool)
                elif op == "isnull":
                    mask = np.isnan(v) if v.dtype.kind == "f" else np.zeros(len(v), bool)
                else:
                    mask = _VALUE_OPS[op](v, lit)
                pdf = pdf[mask]
            yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)


class MdioAlignedReader(MdioReader):
    """``option("variables", "a,b,hdr.ck")`` — the fused aligned scan
    through DSv2: one task decodes EVERY listed variable's chunk at the
    same coords and emits wide rows, so multi-variable alignment costs no
    join and no shuffle (sources/reader.scan_arrays' plan, reachable from
    plain ``spark.read``/SQL). Dimension pushdown (bounds + In) applies
    unchanged; value-column predicates stay with Spark (the columns are
    per-variable, not the single pushable ``value`` column)."""

    def __init__(self, store: ZarrStore, specs, options):
        super().__init__(store, store.array_meta(specs[0][0]), options)
        self.specs = list(specs)
        # the inherited pushFilters consumes predicates on `self.value_col`,
        # but THIS reader's read() has no single value column to apply them
        # to — a variable literally named "value" would silently lose its
        # predicate. Disable value consumption entirely (None never equals
        # a column name); dim bounds/In consumption still applies.
        self.value_col = None

    def read(self, partition: MdioChunkPartition) -> Iterator[pa.RecordBatch]:
        if partition is None:
            return
        store = ZarrStore(self.root, self.version)
        box = self._box()
        steps = tuple(1 for _ in self.dim_names)
        metas = {v: store.array_meta(v) for v, _, _ in self.specs}
        for coords in partition.coords_iter():
            out = None
            for vname, field, out_col in self.specs:
                pdf = _decode_chunk_to_pdf(
                    store, metas[vname], coords, box, steps, self.dim_names,
                    [field] if field else None, out_col,
                )
                if field and field != out_col:
                    pdf = pdf.rename(columns={field: out_col})
                if out is None:
                    out = pdf
                else:
                    # same coords + same grid ⇒ identical row order by
                    # construction: a column move, not a join
                    out[out_col] = pdf[out_col].to_numpy()
            for dim, members in self._dim_in.items():
                if len(out) == 0:
                    break
                out = out[np.isin(out[dim].to_numpy(), members)]
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)


def register(spark) -> None:
    """Register the mdio format on a session (idempotent)."""
    spark.dataSource.register(MdioDataSource)


# ---------------------------------------------------------------- write path


@dataclass
class MdioCommitMessage(WriterCommitMessage):
    """Per-task commit message: which chunks this task wrote (+ fresh zone
    stats when the array has a published manifest). The driver-side commit
    cross-checks exclusivity and folds the zones in."""

    chunk_keys: list  # list[str]
    zones: str        # JSON {chunk_key: [lo, hi]} ("" when no manifest)


class MdioArrowWriter(DataSourceArrowWriter):
    """``df.write.format("mdio")`` — Arrow-batched chunk-aligned writes.

    Single-writer-per-chunk is the correctness contract (the reference calls
    concurrent unaligned writes UB, USER_GUIDE 'Write'; our shuffle-keyed
    write_arrays guarantees it structurally). The DSv2 path can't impose a
    shuffle on the caller, so it enforces the contract at COMMIT: every
    task reports its chunk keys and the driver rejects the job if any chunk
    was written by two tasks. Use ``repartition_by_chunks`` (below) to make
    any frame compliant first.

    Each task accumulates (offset, value) per chunk across its Arrow
    batches, then RMWs each chunk exactly once at task end — one decode +
    one encode per touched chunk regardless of row order."""

    def __init__(self, root: str, version: int, var: str, value_col: str):
        self.root, self.version, self.var, self.value_col = root, version, var, value_col

    def write(self, iterator: Iterator[pa.RecordBatch]) -> MdioCommitMessage:
        store = ZarrStore(self.root, self.version)
        meta = store.array_meta(self.var)
        if meta.is_struct or meta.np_dtype.kind == "c":
            raise ValueError("format('mdio') writes scalar arrays; use write_arrays for struct/complex")
        dims = _dim_names(meta)
        strides = []
        acc = 1
        for c in reversed(meta.chunks):
            strides.append(acc)
            acc *= int(c)
        strides = list(reversed(strides))
        n_cells = int(np.prod(meta.chunks))
        per_chunk: dict[tuple, list] = {}
        for batch in iterator:
            cols = {name: batch.column(i).to_numpy(zero_copy_only=False)
                    for i, name in enumerate(batch.schema.names)}
            idx = [cols[d].astype(np.int64) for d in dims]
            vals = cols[self.value_col]
            ckey = np.zeros(len(vals), dtype=np.int64)
            off = np.zeros(len(vals), dtype=np.int64)
            mult = 1
            grid = meta.grid_shape()
            for d in reversed(range(meta.ndim)):
                ckey += (idx[d] // meta.chunks[d]) * mult
                mult *= grid[d]
                off += (idx[d] % meta.chunks[d]) * strides[d]
            for k in np.unique(ckey):
                m = ckey == k
                per_chunk.setdefault(int(k), []).append((off[m], vals[m]))
        keys, zones = [], {}
        from mdio_cpp_spark.sources import zonemap as _zm

        has_manifest = (
            (CHUNK_STATS_ATTR in meta.attrs or _zm.sidecar_info(meta) is not None)
            and not meta.is_struct
            and meta.np_dtype.kind in "biuf"
        )
        grid = meta.grid_shape()
        for linear, parts in per_chunk.items():
            coords = tuple(int(c) for c in np.unravel_index(linear, grid))
            block = store.decode_chunk(meta, coords)
            flat = (
                np.full(n_cells, meta.fill_scalar(), dtype=meta.np_dtype)
                if block is None
                else block.reshape(-1, order=meta.order).copy()
            )
            for off, vals in parts:
                if len(off) and (off.min() < 0 or off.max() >= n_cells):
                    raise ValueError(f"row outside chunk {coords}")
                flat[off] = vals.astype(meta.np_dtype, copy=False)
            shaped = flat.reshape(meta.chunks)
            store.write_chunk(meta, coords, shaped)
            key = ",".join(str(c) for c in coords)
            keys.append(key)
            if has_manifest:
                valid = tuple(
                    slice(0, min(meta.chunks[d], meta.shape[d] - coords[d] * meta.chunks[d]))
                    for d in range(meta.ndim)
                )
                zones[key] = zone_of(shaped[valid])
        import json

        return MdioCommitMessage(chunk_keys=keys, zones=json.dumps(zones) if zones else "")

    def commit(self, messages) -> None:
        import json
        from collections import Counter

        counts = Counter(k for m in messages if m for k in m.chunk_keys)
        dupes = sorted(k for k, n in counts.items() if n > 1)
        if dupes:
            raise RuntimeError(
                f"chunk(s) {dupes[:5]} written by multiple tasks — the input "
                "frame was not chunk-partitioned; use repartition_by_chunks() "
                "before .write.format('mdio') (concurrent unaligned writes "
                "are UB in the reference too, USER_GUIDE 'Write')"
            )
        store = ZarrStore(self.root, self.version)
        meta = store.array_meta(self.var)
        zones = {}
        for m in messages:
            if m and m.zones:
                zones.update(json.loads(m.zones))
        if zones and CHUNK_STATS_ATTR in meta.attrs:
            manifest = dict(meta.attrs[CHUNK_STATS_ATTR])
            manifest.update(zones)
            store.update_array_attrs(self.var, {**meta.attrs, CHUNK_STATS_ATTR: manifest})
        elif zones:
            # sidecar manifest: fold the touched chunks' zones in via the
            # sidecar RMW (commit messages are already driver-resident —
            # the DSv2 commit contract — so this stays a driver-side fold)
            from mdio_cpp_spark.sources import zonemap as _zm

            _zm.apply_zone_updates(self.root, self.var, zones)
        store.consolidate()

    def abort(self, messages) -> None:  # chunks are atomic (tmp+rename); a
        pass  # partial job leaves prior data intact for untouched chunks


def repartition_by_chunks(df, root: str, var: str):
    """Make a long-form frame DSv2-write-compliant: hash-repartition on the
    chunk id so each chunk lands in exactly one task (the same key
    write_arrays shuffles on)."""
    from pyspark.sql import functions as F

    meta = ZarrStore.open(root).array_meta(var)
    dims = _dim_names(meta)
    key = None
    for d, dim in enumerate(dims):
        term = F.expr(f"{dim} div {int(meta.chunks[d])}")
        key = term if key is None else key * int(meta.grid_shape()[d]) + term
    return df.repartition(key.alias("__chunk"))


class MdioStreamArrowWriter(DataSourceStreamArrowWriter):
    """``writeStream.format("mdio")`` — the DSv2 streaming sink.

    Spark restricts Python streaming sinks to APPEND output mode (update is
    rejected JVM-side, complete is rejected by our overwrite guard), so
    aggregate rollups land via foreachBatch + the batch writer instead
    (streaming/ingest.py — same single-owner RMW argument per micro-batch).

    Per micro-batch the semantics are exactly MdioArrowWriter's (per-task
    chunk accumulation, one RMW per touched chunk, exclusivity checked in
    ``commit``); micro-batches are serialized by the engine, so cross-batch
    chunk conflicts cannot race, and a checkpoint-replayed batch rewrites
    the same cells with the same values (idempotent upsert — the
    foreachBatch sink in streaming/ingest.py makes the same argument).
    Within a batch the stream must be chunk-partitioned like the batch
    path; commit rejects violations per micro-batch."""

    def __init__(self, root: str, version: int, var: str, value_col: str):
        self._delegate = MdioArrowWriter(root, version, var, value_col)

    def write(self, iterator: Iterator[pa.RecordBatch]) -> "MdioCommitMessage":
        return self._delegate.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        self._delegate.commit(messages)

    def abort(self, messages, batchId: int) -> None:
        self._delegate.abort(messages)


# ---------------------------------------------------------------- stream read

@dataclass
class MdioTailPartition(InputPartition):
    """One chunk-aligned slice [lo, hi) of the append dimension."""
    lo: int
    hi: int


class MdioStreamReader(DataSourceStreamReader):
    """``readStream.format("mdio")`` — tail a GROWING 1-D store.

    The streaming inverse of the append workflow (zarr26 / utils/resize.py
    grow_dataset): producers extend the array and write new cells; each
    micro-batch emits exactly the cells appended since the last committed
    offset, through chunk-aligned partitions (same decode machinery and
    parallelism as the batch scan). Replay after a checkpoint restart
    re-reads the same half-open cell range — exactly-once as long as
    emitted cells are immutable.

    THE FRONTIER. The append protocol must publish the new shape BEFORE
    writing the cells (the writer bounds-checks against the shape), so
    "shape" alone can run ahead of the data: a trigger landing between
    grow and write would emit fill values for in-flight cells and never
    revisit them. Producers that need the stronger guarantee publish a
    watermark AFTER the cells land (``patch_array_attrs`` MERGES — using
    the wholesale-replace ``update_array_attrs`` here would silently drop
    the array's other attrs, e.g. the zone-map manifest)::

        store.patch_array_attrs(var, {"frontier": n_written})
        store.consolidate()

    When the array carries a ``frontier`` attribute the stream never reads
    past ``min(shape, frontier)``; without it the shape is the frontier and
    the grow→write window is the producer's responsibility (the caveat is
    inherent to shape-first publication, not to this reader).

    Options: ``starting_offset`` = ``earliest`` (default) | ``latest``
    (skip the existing array and tail only future appends — the cold-start
    answer for a petascale store); ``max_cells_per_trigger`` caps each
    micro-batch once a baseline offset is known (the engine may probe
    ``latestOffset`` before ``initialOffset``, and capping without a
    baseline could regress a restored checkpoint — so the FIRST batch of a
    query run is uncapped and every subsequent one is bounded; bound the
    cold start itself with ``starting_offset=latest``); ``fields`` /
    ``value_col`` as on the batch reader.

    N-D stores append along ONE nominated dimension (``append_dim``
    option, default the first dimension): the frontier is the store's
    length along that dimension, each micro-batch emits the newly
    appended SLABS — the full extent of every other dimension crossed
    with the new append-dim range — and partitions stay chunk-aligned
    along the append dimension (a task may decode several chunks across
    the other dimensions, but no two tasks share a chunk). That is the
    reference's resize model exactly: per-dimension metadata growth
    (utils/trim.h's inverse), rows land per-slab.
    """

    def __init__(self, root: str, version: int, var: str, options):
        self.root = root
        self.version = version
        self.var = var
        self.value_col = options.get("value_col", "value")
        meta = ZarrStore(root, version).array_meta(var)
        self.dims = _dim_names(meta)
        append_dim = options.get("append_dim") or self.dims[0]
        if append_dim not in self.dims:
            raise ValueError(
                f"append_dim {append_dim!r} is not a dimension of {var!r} "
                f"(has {self.dims})"
            )
        self.axis = self.dims.index(append_dim)
        fields = options.get("fields")
        self.fields = fields.split(",") if fields else (
            list(meta.np_dtype.names) if meta.is_struct else None
        )
        self.dim = append_dim
        self.chunk = int(meta.chunks[self.axis])
        self.start_latest = options.get("starting_offset", "earliest") == "latest"
        cap = options.get("max_cells_per_trigger")
        self.max_cells = int(cap) if cap else None
        self._last_end: int | None = None

    # ------------------------------------------------------------- offsets

    def _frontier(self) -> int:
        # ONE fresh consolidated-metadata read: the append-dim length is
        # the high-water mark, clamped by the producer's post-write
        # watermark when present
        meta = ZarrStore(self.root, self.version).array_meta(self.var)
        n = int(meta.shape[self.axis])
        frontier = meta.attrs.get("frontier")
        return min(n, int(frontier)) if frontier is not None else n

    def initialOffset(self) -> dict:
        start = self._frontier() if self.start_latest else 0
        self._last_end = start
        return {"cell": start}

    def latestOffset(self) -> dict:
        # stateless w.r.t. repeated calls within one trigger (the engine may
        # probe more than once); the cap keys off the last KNOWN baseline
        # (initialOffset, a planned batch start, or a commit) and is never
        # applied without one — a blind cap could fall below a restored
        # checkpoint and regress it
        end = self._frontier()
        if self.max_cells is not None and self._last_end is not None:
            end = max(min(end, self._last_end + self.max_cells), self._last_end)
        return {"cell": end}

    def partitions(self, start: dict, end: dict) -> list[MdioTailPartition]:
        lo, hi = int(start["cell"]), int(end["cell"])
        # the engine's batch start is an authoritative baseline for the cap
        if self._last_end is None or lo > self._last_end:
            self._last_end = lo
        if hi <= lo:
            return [MdioTailPartition(lo, lo)]  # empty batch — read yields nothing
        # chunk-aligned slices: every interior split point is a chunk
        # boundary, so no two tasks decode the same chunk
        out: list[MdioTailPartition] = []
        b = lo
        while b < hi:
            nxt = min(((b // self.chunk) + 1) * self.chunk, hi)
            out.append(MdioTailPartition(b, nxt))
            b = nxt
        return out

    # ------------------------------------------------------------- execute

    def read(self, partition: MdioTailPartition) -> Iterator[pa.RecordBatch]:
        if partition.hi <= partition.lo:
            return
        import itertools

        store = ZarrStore(self.root, self.version)
        meta = store.array_meta(self.var)
        # box: the new append-dim slab crossed with every other dim's full
        # extent; chunk coords iterate the product of per-dim chunk ranges
        box = tuple(
            (partition.lo, partition.hi) if d == self.axis
            else (0, int(meta.shape[d]))
            for d in range(meta.ndim)
        )
        ranges = [
            range(b[0] // meta.chunks[d], (b[1] - 1) // meta.chunks[d] + 1)
            for d, b in enumerate(box)
        ]
        steps = (1,) * meta.ndim
        for coords in itertools.product(*ranges):
            pdf = _decode_chunk_to_pdf(
                store, meta, coords, box, steps, self.dims, self.fields,
                self.value_col,
            )
            if len(pdf):
                yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)

    def commit(self, end: dict) -> None:
        self._last_end = int(end["cell"])
