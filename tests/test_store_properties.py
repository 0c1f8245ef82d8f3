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


@st.composite
def overlapping_writes_case(draw):
    shape = (draw(st.integers(8, 60)),)
    chunks = (draw(st.integers(1, shape[0])),)
    n_writes = draw(st.integers(2, 4))
    writes = []
    for _ in range(n_writes):
        o = draw(st.integers(0, shape[0] - 1))
        s = draw(st.integers(1, shape[0] - o))
        writes.append((o, s))
    return shape, chunks, writes


@settings(max_examples=40, deadline=None)
@given(overlapping_writes_case())
def test_sequential_overlapping_writes_rmw(case):
    """ANY sequence of overlapping region writes must behave like numpy
    assignment order — the RMW guarantee: later writes win where regions
    overlap, earlier data survives everywhere else (never reset to fill)."""
    shape, chunks, writes = case
    root = os.path.join(TMP, "rmw")
    shutil.rmtree(root, ignore_errors=True)
    store = ZarrStore.create(root, version=2)
    meta = store.create_array("a", shape=shape, chunks=chunks, dtype="float64",
                              dims=("i",), compressor={"id": "zlib", "level": 1})
    expected = np.full(shape, meta.fill_scalar(), dtype="f8")
    for w, (o, s) in enumerate(writes):
        data = np.arange(s, dtype="f8") + 1000.0 * (w + 1)
        store.write_array_numpy("a", data, origin=(o,))
        expected[o:o + s] = data
    store.consolidate()
    got = ZarrStore.open(root).read_array("a")
    assert np.array_equal(got, expected, equal_nan=True)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_multi_run_point_sel_matches_numpy(data):
    """sel(point) with repeated coordinate values over ANY placement must
    read back exactly the rows numpy fancy-indexing selects."""
    from mdio_cpp_spark.model import MdioDataset

    n = data.draw(st.integers(6, 40))
    value = 7
    coord = np.arange(100, 100 + n, dtype="i8")
    hit_idx = sorted(data.draw(st.sets(st.integers(0, n - 1), min_size=1, max_size=6)))
    coord[hit_idx] = value
    root = os.path.join(TMP, "runs")
    shutil.rmtree(root, ignore_errors=True)
    spec = {
        "metadata": {"name": "m", "apiVersion": "1.0.0"},
        "variables": [
            {"name": "i", "dataType": "int64", "dimensions": [{"name": "i", "size": n}]},
            {"name": "v", "dataType": "float64", "dimensions": ["i"], "coordinates": ["i"]},
        ],
    }
    ds = MdioDataset.from_json(spec, root)
    ds.store.write_array_numpy("i", coord)
    vals = np.arange(n, dtype="f8") * 1.5
    ds.store.write_array_numpy("v", vals)
    ds = MdioDataset.open(root)
    sel = ds.sel(i=value)
    got = sel.var("v").read()
    assert np.array_equal(got, vals[np.flatnonzero(coord == value)])
    assert sel.var("v").num_samples() == len(hit_idx)


# ------------------------------------------------------ v2 filter properties

from mdio_cpp_spark.sources import codecs as _C

_FILTER_INT_DTYPES = ["<i2", "<i4", "<i8"]


@st.composite
def filter_chain_case(draw):
    """A random int array plus a random LOSSLESS numcodecs chain (delta and
    shuffle compose losslessly on ints; fso with scale=1 offset=int is an
    exact affine on ints)."""
    dtype = draw(st.sampled_from(_FILTER_INT_DTYPES))
    n = draw(st.integers(0, 200))
    info = np.iinfo(dtype)
    # keep |values| small enough that delta diffs can't overflow the dtype
    bound = int(min(2 ** 14, info.max // 4))
    vals = np.array(
        draw(st.lists(st.integers(-bound, bound), min_size=n, max_size=n)),
        dtype=dtype,
    )
    chain = []
    seen_shuffle = False
    for _ in range(draw(st.integers(1, 3))):
        kind = draw(st.sampled_from(["delta", "shuffle", "fso"]))
        if kind == "shuffle":
            seen_shuffle = True
            chain.append({"id": "shuffle",
                          "elementsize": draw(st.sampled_from([1, 2, 4, 8]))})
        elif kind == "delta":
            # delta after shuffle is still lossless: diff/cumsum wrap mod
            # 2**bits symmetrically, whatever the byte-soup values are
            chain.append({"id": "delta", "dtype": dtype})
        elif not seen_shuffle:
            # fso must NOT follow a byte shuffle: its decode is float64
            # division (numcodecs' own formula), which corrupts shuffled
            # byte-soup int64s beyond 2**53 — hypothesis found exactly this.
            # Real chains put array->array filters before byte-level ones.
            chain.append({"id": "fixedscaleoffset", "dtype": dtype,
                          "astype": dtype, "scale": 1,
                          "offset": draw(st.integers(-50, 50))})
    if not chain:
        chain.append({"id": "delta", "dtype": dtype})
    return vals, chain


@settings(max_examples=60, deadline=None)
@given(filter_chain_case())
def test_filter_chain_roundtrip_lossless(case):
    """decode(encode(x)) == x for ANY composition of lossless v2 filters,
    any int dtype, any length (incl. 0 and shuffle-indivisible tails)."""
    vals, chain = case
    enc = _C.encode_v2_filters(vals.tobytes(), chain)
    dec = np.frombuffer(_C.decode_v2_filters(enc, chain), dtype=vals.dtype)
    assert np.array_equal(dec, vals)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), max_size=150),
    st.integers(1, 6),
)
def test_quantize_idempotent_and_bounded(xs, digits):
    """quantize is a projection: one application moves each value at most
    10**-digits (the numcodecs precision contract), and re-encoding the
    decoded output is the identity (already on the grid)."""
    vals = np.array(xs, dtype="<f8")
    q = [{"id": "quantize", "digits": digits, "dtype": "<f8"}]
    once = np.frombuffer(
        _C.decode_v2_filters(_C.encode_v2_filters(vals.tobytes(), q), q),
        dtype="<f8",
    )
    assert np.all(np.abs(once - vals) <= 10.0 ** -digits)
    twice = np.frombuffer(
        _C.decode_v2_filters(_C.encode_v2_filters(once.tobytes(), q), q),
        dtype="<f8",
    )
    assert np.array_equal(twice, once)


@settings(max_examples=25, deadline=None)
@given(filter_chain_case())
def test_filtered_store_vs_spec_reader(case):
    """Engine-written filtered v2 chunks are readable by the INDEPENDENT
    spec-derived reader for any lossless chain — the cross-implementation
    differential, randomized."""
    vals, chain = case
    if len(vals) == 0:
        return
    from tests import spec_zarr_reader as specr

    root = os.path.join(TMP, "filterprop")
    shutil.rmtree(root, ignore_errors=True)
    st_ = ZarrStore.create(root, version=2)
    meta = st_.create_array(
        "v", shape=(len(vals),), chunks=(min(len(vals), 7),),
        dtype=str(np.dtype(vals.dtype).name), dims=("i",),
        compressor={"id": "zlib", "level": 1}, filters=chain,
    )
    st_.write_array_numpy("v", vals)
    assert np.array_equal(st_.read_array("v"), vals)
    assert np.array_equal(specr.read_zarr_array(root, "v"), vals)
