"""Property-based store tests (hypothesis): for ANY (shape, chunks, dtype,
write-region, read-box), the pure-Python store round-trips exactly — written
cells return their values, everything else returns fill. The reference has
no randomized testing (SURVEY §5); this is an upgrade, not a port.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
from hypothesis import given, settings, strategies as st

from mdio_cpp_spark.sources.zarr_store import ZarrStore

TMP = "/root/repo/.zarr_cache/_prop"

DTYPES = ["int16", "int32", "int64", "uint16", "float32", "float64"]


@st.composite
def store_case(draw):
    ndim = draw(st.integers(1, 3))
    shape = tuple(draw(st.integers(1, 40)) for _ in range(ndim))
    chunks = tuple(draw(st.integers(1, max(1, s))) for s in shape)
    dtype = draw(st.sampled_from(DTYPES))
    version = draw(st.sampled_from([2, 3]))
    # write region: a sub-box (possibly empty along no dim — origin+size>=1)
    origin = tuple(draw(st.integers(0, max(0, s - 1))) for s in shape)
    size = tuple(draw(st.integers(1, s - o)) for s, o in zip(shape, origin))
    # read box
    lo = tuple(draw(st.integers(0, s)) for s in shape)
    hi = tuple(draw(st.integers(l, s)) for l, s in zip(lo, shape))
    return ndim, shape, chunks, dtype, version, origin, size, lo, hi


@settings(max_examples=40, deadline=None)
@given(store_case())
def test_roundtrip_with_fill(case):
    ndim, shape, chunks, dtype, version, origin, size, lo, hi = case
    root = os.path.join(TMP, "case")
    shutil.rmtree(root, ignore_errors=True)
    store = ZarrStore.create(root, version=version)
    meta = store.create_array(
        "a", shape=shape, chunks=chunks, dtype=dtype, dims=tuple(f"d{i}" for i in range(ndim)),
        compressor={"id": "zlib" if version == 2 else "gzip", "level": 1},
    )
    rng = np.random.default_rng(42)
    np_dt = meta.np_dtype
    if np_dt.kind == "f":
        data = rng.standard_normal(size).astype(np_dt)
    else:
        info = np.iinfo(np_dt)
        data = rng.integers(info.min, info.max, size=size, dtype=np_dt)
    store.write_array_numpy("a", data, origin=origin)
    store.consolidate()

    # expected full array: fill everywhere, data in the written box
    expected = np.full(shape, meta.fill_scalar(), dtype=np_dt)
    expected[tuple(slice(o, o + s) for o, s in zip(origin, size))] = data

    got = ZarrStore.open(root).read_array(
        "a", {f"d{i}": (lo[i], hi[i]) for i in range(ndim)}
    )
    exp = expected[tuple(slice(l, h) for l, h in zip(lo, hi))]
    assert got.shape == exp.shape
    if np_dt.kind == "f":
        assert np.array_equal(got, exp, equal_nan=True)
    else:
        assert np.array_equal(got, exp)
