"""Resize-grow: the inverse of IO8 trim (utils/trim.py).

The reference sizes datasets at creation and only ever *shrinks* them
(``utils::TrimDataset`` → ``tensorstore::Resize``, reference
``mdio/utils/trim.h:45-117``); the same Resize machinery grows bounds, which
is what an append workflow needs. Growing is a pure metadata operation here:
newly-exposed cells are never materialized — absent chunks read as fill
(sparse semantics, reference ``dataset_factory.h:500-545``), and the old
boundary chunk needs no rewrite because the writer always encodes full
fill-initialized blocks, so its out-of-bounds tail already holds fill.

Single-writer metadata operation; consolidated metadata republished at the
end (CommitMetadata-on-resize, reference ``dataset.h:1269-1416``).
"""

from __future__ import annotations

from mdio_cpp_spark.sources.zarr_store import ZarrStore


def grow_dataset(path: str, **new_sizes: int) -> dict:
    """Grow dims to new sizes, e.g. ``grow_dataset(p, i=20000)``.

    Every array carrying a named dim is grown along it. Shrinking is
    rejected — that is ``trim_dataset``'s job (destructive, chunk-deleting).
    Returns {variable: new_shape}.
    """
    store = ZarrStore.open(path)
    report: dict[str, tuple] = {}
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
        if store.version == 2:
            zarray = store._read_json(f"{name}/.zarray")
            zarray["shape"] = new_shape
            store._write_json(f"{name}/.zarray", zarray)
        else:
            zjson = store._read_json(f"{name}/zarr.json")
            zjson["shape"] = new_shape
            store._write_json(f"{name}/zarr.json", zjson)
        report[name] = tuple(new_shape)
    store.consolidate()
    return report
