"""NumPy ``.npy`` export of a selected sub-volume — the sink of the
reference's ``real_data_example`` (``src/seismic_numpy.h:1-114`` hand-writes
the public npy v1.0 header + C-order buffer; ``src/real_data_example.cc:78``
``WriteNumpy(accessor, "seismic_slice.npy")``). numpy's own writer emits the
identical format, so we use it rather than re-deriving header bytes.

``.npy`` is a single contiguous buffer: the export is inherently a
driver-side materialization of the (chunk-pruned) selection, exactly like
the reference example reading its slice into one accessor. The guard below
keeps that honest — a request past the bound raises instead of OOMing the
driver. The 100-TB path for big sub-volumes is NOT this sink: shard
per-chunk (mm09's shard-plan shape) or hand the selection to ``to_df`` and
write a distributed format.
"""

from __future__ import annotations

import math

import numpy as np

# refuse driver materializations past this (the example's slices are a few
# hundred MB; a whole-volume request is a mistake, not an export)
MAX_EXPORT_BYTES = 256 * 1024 * 1024


def export_npy(var, path: str) -> tuple[int, ...]:
    """Write the variable's current selection as npy v1.0; returns shape.

    ``var`` is an ``MdioVariable`` (possibly on an isel'd dataset); the
    size guard runs BEFORE any chunk is fetched.
    """
    sizes = var._selected_sizes()
    nbytes = var.meta.np_dtype.itemsize * math.prod(sizes.values())
    if nbytes > MAX_EXPORT_BYTES:
        raise ValueError(
            f"npy export of {nbytes} bytes exceeds the {MAX_EXPORT_BYTES}-byte "
            "driver-materialization bound; shard per-chunk or use to_df() + "
            "a distributed sink for sub-volumes this large")
    arr = var.read()
    with open(path, "wb") as f:
        np.lib.format.write_array(f, arr, version=(1, 0), allow_pickle=False)
    return arr.shape


def import_npy(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return np.lib.format.read_array(f, allow_pickle=False)
