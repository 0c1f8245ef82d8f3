"""TrimDataset analog (IO8, /root/reference/mdio/utils/trim.h:45-117).

Destructively shrinks every variable along the given dimensions: the stored
shape metadata is reduced, and chunk files lying wholly beyond the new
boundary are deleted. Partially-overlapping boundary chunks are kept — their
out-of-bounds cells become unreadable via domain clamping, exactly the
``resize_tied_bounds`` behavior. Pass ``delete_chunks=False`` for the
``resize_metadata_only`` variant (shape shrinks, data files stay).

Single-writer metadata operation; the consolidated metadata is republished
at the end (the reference's CommitMetadata-on-trim path).
"""

from __future__ import annotations

from mdio_cpp_spark.sources.zarr_store import ZarrStore


def trim_dataset(path: str, delete_chunks: bool = True, **new_sizes: int) -> dict:
    """Trim dims to new sizes, e.g. ``trim_dataset(p, inline=100)``.

    Returns {variable: chunks_deleted}. Growing a dimension is rejected
    (trim means shrink — trim.h semantics).
    """
    store = ZarrStore.open(path)
    report: dict[str, int] = {}
    for name, meta in store.arrays().items():
        dims = meta.dims or tuple(f"dim_{d}" for d in range(meta.ndim))
        if not any(d in new_sizes for d in dims):
            continue
        new_shape = list(meta.shape)
        for d, dim in enumerate(dims):
            if dim in new_sizes:
                ns = int(new_sizes[dim])
                if ns > meta.shape[d]:
                    raise ValueError(
                        f"trim cannot grow {dim!r} ({meta.shape[d]} -> {ns})"
                    )
                new_shape[d] = ns
        deleted = 0
        if delete_chunks:
            # delete chunk files wholly beyond the new boundary
            keep_grid = [max(1, -(-new_shape[d] // meta.chunks[d])) for d in range(meta.ndim)]
            from mdio_cpp_spark.sources.zarr_store import chunks_overlapping

            full_box = tuple((0, s) for s in meta.shape)
            for coords in chunks_overlapping(meta, full_box):
                if any(coords[d] >= keep_grid[d] or new_shape[d] == 0 for d in range(meta.ndim)):
                    if store._kv.delete(meta.chunk_key(coords)):
                        deleted += 1
        # rewrite shape metadata
        if store.version == 2:
            zarray = store._read_json(f"{name}/.zarray")
            zarray["shape"] = new_shape
            store._write_json(f"{name}/.zarray", zarray)
        else:
            zjson = store._read_json(f"{name}/zarr.json")
            zjson["shape"] = new_shape
            store._write_json(f"{name}/zarr.json", zjson)
        report[name] = deleted
    store.consolidate()
    return report


def grow_dataset(path: str, **new_sizes: int) -> dict:
    """Grow dims to new sizes, e.g. ``grow_dataset(p, inline=9000)`` — the
    append direction of the reference's resize seam (trim.h:98-112 drives
    ``tensorstore::Resize`` with ``resize_metadata_only``; growing is the
    same metadata rewrite with no chunk side effects). A grow is O(1)
    regardless of array size: unwritten cells beyond the old boundary read
    as fill until a writer materializes their chunks, so appending to a
    100-TB array costs one metadata object PUT. Shrinking is rejected —
    that is ``trim_dataset``'s job (it must also delete stranded chunks).

    Returns {variable: cells_added}. Single-writer metadata operation; the
    consolidated metadata is republished at the end.
    """
    store = ZarrStore.open(path)
    report: dict[str, int] = {}
    for name, meta in store.arrays().items():
        dims = meta.dims or tuple(f"dim_{d}" for d in range(meta.ndim))
        if not any(d in new_sizes for d in dims):
            continue
        new_shape = list(meta.shape)
        for d, dim in enumerate(dims):
            if dim in new_sizes:
                ns = int(new_sizes[dim])
                if ns < meta.shape[d]:
                    raise ValueError(
                        f"grow cannot shrink {dim!r} ({meta.shape[d]} -> {ns}); "
                        "use trim_dataset"
                    )
                new_shape[d] = ns
        old_cells = 1
        new_cells = 1
        for a, b in zip(meta.shape, new_shape):
            old_cells *= a
            new_cells *= b
        if store.version == 2:
            zarray = store._read_json(f"{name}/.zarray")
            zarray["shape"] = new_shape
            store._write_json(f"{name}/.zarray", zarray)
        else:
            zjson = store._read_json(f"{name}/zarr.json")
            zjson["shape"] = new_shape
            store._write_json(f"{name}/zarr.json", zjson)
        report[name] = new_cells - old_cells
    store.consolidate()
    return report
