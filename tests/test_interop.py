"""Writer-vs-foreign-reader differential (the reference's interop pattern:
regression_tests/xarray_compatibility_test.py, acceptance_test.cc:1350-1597).

Our writer emits a store; an INDEPENDENT spec-derived reader
(spec_zarr_reader.py — stdlib+numpy only, no mdio_cpp_spark imports) parses
the raw bytes and must reproduce every value. zarr-python equality tests are
included behind importorskip, activating wherever the real wheel exists
(uninstallable here — see INTEROP_PROBE.md)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from mdio_cpp_spark.sources.writer import dense_fill_frame, write_array
from mdio_cpp_spark.sources.zarr_store import ZarrStore

from tests import spec_zarr_reader as specr

TMP = "/root/repo/.zarr_cache/_tests/interop"


def _fresh(name: str) -> str:
    path = os.path.join(TMP, name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def test_spec_reader_is_independent():
    # the oracle must not share code with the implementation under test
    import tests.spec_zarr_reader as m

    src = open(m.__file__).read()
    assert "mdio_cpp_spark" not in src.replace("imports NOTHING from mdio_cpp_spark", "")


@pytest.mark.parametrize("version", [2, 3])
@pytest.mark.parametrize("mdio_type,np_dt,vals", [
    ("float32", "f4", np.linspace(-1, 1, 300).astype("f4")),
    ("int64", "i8", np.arange(-150, 150, dtype="i8")),
    ("uint16", "u2", (np.arange(300) % 60000).astype("u2")),
    ("float64", "f8", np.arange(300, dtype="f8") * 0.125),
])
def test_scalar_roundtrip_via_spec_reader(version, mdio_type, np_dt, vals):
    root = _fresh(f"scalar_{mdio_type}_v{version}")
    st = ZarrStore.create(root, version=version)
    st.create_array("a", shape=(300,), chunks=(64,), dtype=mdio_type, dims=("i",),
                    compressor={"id": "zlib" if version == 2 else "gzip", "level": 5})
    st.write_array_numpy("a", vals)
    st.consolidate()
    got = specr.read_zarr_array(root, "a")
    assert got.dtype == np.dtype(np_dt)
    assert np.array_equal(got, vals)


@pytest.mark.parametrize("version", [2, 3])
def test_fill_and_edge_chunks_via_spec_reader(version):
    # absent chunks must read as the declared fill; edge chunk padded per spec
    root = _fresh(f"fill_v{version}")
    st = ZarrStore.create(root, version=version)
    st.create_array("u", shape=(150,), chunks=(64,), dtype="uint32", dims=("i",))
    st.write_array_numpy("u", np.arange(10, dtype="u4"), origin=(70,))  # chunk 1 only
    st.consolidate()
    got = specr.read_zarr_array(root, "u")
    assert (got[:64] == 2**32 - 1).all()          # chunk 0 absent → fill
    assert np.array_equal(got[70:80], np.arange(10))
    assert (got[128:] == 2**32 - 1).all()          # edge chunk (22 cells)


@pytest.mark.parametrize("version", [2, 3])
def test_struct_via_spec_reader(version):
    root = _fresh(f"struct_v{version}")
    st = ZarrStore.create(root, version=version)
    st.create_array("h", shape=(100,), chunks=(32,), dtype={"fields": [
        {"name": "ck", "format": "int32"}, {"name": "ok", "format": "int64"}]},
        dims=("i",), compressor={"id": "zlib" if version == 2 else "gzip", "level": 3})
    rec = np.zeros(100, dtype=[("ck", "<i4"), ("ok", "<i8")])
    rec["ck"] = np.arange(100)
    rec["ok"] = np.arange(100) * 31
    st.write_array_numpy("h", rec)
    st.consolidate()
    got = specr.read_zarr_array(root, "h")
    assert got.dtype.names == ("ck", "ok")
    assert np.array_equal(got["ck"], rec["ck"]) and np.array_equal(got["ok"], rec["ok"])


def test_string_datetime_arrays_via_spec_reader():
    # SURVEY §1.2 upgrade: U/M stored arrays (header-only in the reference)
    root = _fresh("strdt")
    st = ZarrStore.create(root, version=2)
    st.create_array("s", shape=(40,), chunks=(16,), dtype=np.dtype("<U8"), dims=("i",),
                    compressor={"id": "zlib", "level": 1})
    svals = np.array([f"row-{i}" for i in range(40)], dtype="<U8")
    st.write_array_numpy("s", svals)
    st.create_array("t", shape=(40,), chunks=(16,), dtype=np.dtype("<M8[us]"), dims=("i",))
    tvals = (np.datetime64("2020-01-01", "us") + np.arange(40) * np.timedelta64(1, "D")).astype("<M8[us]")
    st.write_array_numpy("t", tvals)
    st.consolidate()
    assert np.array_equal(specr.read_zarr_array(root, "s"), svals)
    assert np.array_equal(specr.read_zarr_array(root, "t"), tvals)


@pytest.mark.parametrize("version", [2, 3])
def test_complex_and_float16_via_spec_reader(version):
    root = _fresh(f"cpx_v{version}")
    st = ZarrStore.create(root, version=version)
    st.create_array("c", shape=(80,), chunks=(32,), dtype="complex128", dims=("i",))
    vals = np.arange(80) * 0.5 - 1j * np.arange(80)
    st.write_array_numpy("c", vals.astype("c16"))
    st.create_array("h", shape=(80,), chunks=(32,), dtype="float16", dims=("i",))
    st.write_array_numpy("h", (np.arange(80) / 7).astype("f2"))
    st.consolidate()
    assert np.array_equal(specr.read_zarr_array(root, "c"), vals.astype("c16"))
    assert np.array_equal(specr.read_zarr_array(root, "h"), (np.arange(80) / 7).astype("f2"))


@pytest.mark.parametrize("version", [2, 3])
def test_spark_write_via_spec_reader(spark, version):
    # the DISTRIBUTED writer's bytes, not just the driver-side helper
    from pyspark.sql import functions as F

    root = _fresh(f"spark_v{version}")
    st = ZarrStore.create(root, version=version)
    st.create_array("w", shape=(1000,), chunks=(128,), dtype="float64", dims=("i",),
                    compressor={"id": "zlib" if version == 2 else "gzip", "level": 2})
    st.consolidate()
    src = dense_fill_frame(spark, (1000,), ["i"], 0.0).withColumn("value", F.col("i") * 0.75)
    write_array(src, root, "w")
    got = specr.read_zarr_array(root, "w")
    assert np.allclose(got, np.arange(1000) * 0.75)


def test_2d_grid_via_spec_reader():
    root = _fresh("grid2d")
    st = ZarrStore.create(root, version=2)
    st.create_array("g", shape=(50, 70), chunks=(16, 32), dtype="float32", dims=("r", "c"),
                    compressor={"id": "gzip", "level": 1})
    vals = np.arange(50 * 70, dtype="f4").reshape(50, 70)
    st.write_array_numpy("g", vals)
    st.consolidate()
    assert np.array_equal(specr.read_zarr_array(root, "g"), vals)


def test_v3_v2_chunk_keys_roundtrip_via_spec_reader():
    """A v3 store using the spec's 'v2' chunk-key encoding (bare '0.1'
    keys, '.' separator — what a migrated v2 store keeps) must write keys
    the spec reader finds and read back its own bytes."""
    root = _fresh("v3_v2keys")
    st = ZarrStore.create(root, version=3)
    st.create_array("g", shape=(50, 70), chunks=(16, 32), dtype="float32",
                    dims=("r", "c"), compressor={"id": "gzip", "level": 1},
                    chunk_key_encoding="v2")
    vals = np.arange(50 * 70, dtype="f4").reshape(50, 70)
    st.write_array_numpy("g", vals)
    # the on-disk layout really is bare v2-style keys, not a c/ tree
    assert os.path.exists(os.path.join(root, "g", "0.0"))
    assert os.path.exists(os.path.join(root, "g", "3.2"))
    assert not os.path.exists(os.path.join(root, "g", "c"))
    # independent spec reader agrees
    assert np.array_equal(specr.read_zarr_array(root, "g"), vals)
    # our own reader (fresh store handle → metadata re-parsed) agrees
    st2 = ZarrStore.open(root)
    assert st2.array_meta("g").key_encoding == "v2"
    assert np.array_equal(st2.read_array("g"), vals)
    # ranged read exercises chunk addressing through the same key mapping
    got = st2.read_array("g", ranges={"r": (10, 40), "c": (30, 66)})
    assert np.array_equal(got, vals[10:40, 30:66])


def test_v3_v2_chunk_keys_explicit_separator():
    """v2 encoding with an explicit '/' separator nests keys like '0/1'."""
    root = _fresh("v3_v2keys_slash")
    st = ZarrStore.create(root, version=3)
    meta = st.create_array("a", shape=(8,), chunks=(4,), dtype="int32",
                           dims=("i",), chunk_key_encoding="v2")
    # rewrite the array doc with an explicit separator (create_array pins
    # "." for v2 encoding; a foreign writer may choose "/")
    import json
    doc = json.loads(open(os.path.join(root, "a", "zarr.json")).read())
    doc["chunk_key_encoding"] = {"name": "v2", "configuration": {"separator": "/"}}
    open(os.path.join(root, "a", "zarr.json"), "w").write(json.dumps(doc))
    st2 = ZarrStore.open(root)
    m = st2.array_meta("a")
    assert (m.key_encoding, m.separator) == ("v2", "/")
    vals = np.arange(8, dtype="i4")
    st2.write_array_numpy("a", vals)
    assert os.path.exists(os.path.join(root, "a", "0"))
    assert np.array_equal(specr.read_zarr_array(root, "a"), vals)
    assert np.array_equal(st2.read_array("a"), vals)


def test_attrs_roundtrip_via_spec_reader():
    root = _fresh("attrs")
    st = ZarrStore.create(root, version=2, attrs={"name": "interop", "apiVersion": "1.0.0"})
    st.create_array("a", shape=(8,), chunks=(8,), dtype="int32", dims=("i",))
    st.update_array_attrs("a", {"statsV1": {"count": 8}, "_ARRAY_DIMENSIONS": ["i"]})
    st.consolidate()
    assert specr.read_group_attrs(root)["name"] == "interop"
    attrs = specr.read_array_attrs(root, "a")
    assert attrs["statsV1"] == {"count": 8}
    assert attrs["_ARRAY_DIMENSIONS"] == ["i"]  # xarray dim-label convention


# --------- true third-party oracle, active wherever the wheel exists --------

@pytest.mark.parametrize("version", [2, 3])
def test_zarr_python_readback(version):
    zarr = pytest.importorskip("zarr")
    root = _fresh(f"zarrpy_v{version}")
    st = ZarrStore.create(root, version=version)
    st.create_array("a", shape=(300,), chunks=(64,), dtype="float32", dims=("i",),
                    compressor={"id": "zlib" if version == 2 else "gzip", "level": 5})
    vals = np.linspace(0, 1, 300, dtype="f4")
    st.write_array_numpy("a", vals)
    st.consolidate()
    grp = zarr.open(root, mode="r")
    assert np.array_equal(np.asarray(grp["a"]), vals)


@pytest.mark.parametrize("version", [2, 3])
@pytest.mark.parametrize("cname,shuffle", [
    ("zlib", 1), ("lz4", 0), ("lz4", 1), ("lz4", 2),
])
def test_blosc_frames_via_spec_reader(version, cname, shuffle):
    """The engine's blosc frames (zlib AND lz4 cnames, incl. lz4's split
    full blocks) validated by the INDEPENDENT spec reader — its own LZ4
    block decoder and extent-based split detection, zero engine imports."""
    root = _fresh(f"blosc_{cname}_s{shuffle}_v{version}")
    st = ZarrStore.create(root, version=version)
    vals = ((np.arange(900) * 37) % 1009).astype("f8")
    st.create_array(
        "a", shape=(900,), chunks=(256,), dtype="float64", dims=("i",),
        compressor={"id": "blosc", "cname": cname, "clevel": 5, "shuffle": shuffle},
    )
    st.write_array_numpy("a", vals)
    st.consolidate()
    got = specr.read_zarr_array(root, "a")
    assert np.array_equal(got, vals)


@pytest.mark.parametrize("version", [2, 3])
def test_consolidated_doc_matches_walked_tree(version):
    """The consolidated document is only trustworthy if it mirrors the
    per-node tree EXACTLY — the spec reader cross-checks both sides
    (verify_consolidated) instead of trusting either, through every
    mutation the engine performs: consolidate, incremental create,
    attr update, resize."""
    root = _fresh(f"cons_parity_v{version}")
    st = ZarrStore.create(root, version=version, attrs={"title": "parity"})
    comp = {"id": "zlib" if version == 2 else "gzip", "level": 4}
    st.create_array("a", shape=(100,), chunks=(32,), dtype="float32",
                    dims=("i",), compressor=comp)
    st.write_array_numpy("a", np.arange(100, dtype="f4"))
    st.consolidate()
    assert specr.verify_consolidated(root) == []
    # incremental create patches the doc — stays in lockstep with the tree
    st.create_array("b", shape=(10,), chunks=(10,), dtype="int16",
                    dims=("j",))
    assert specr.verify_consolidated(root) == []
    # attr update rewrites the array doc AND its consolidated entry
    st.update_array_attrs("a", {"units": "m"})
    assert specr.verify_consolidated(root) == []


@pytest.mark.parametrize("version", [2, 3])
def test_consolidated_drift_is_detected(version):
    """A doc/tree disagreement must be reported as a differential failure,
    never trusted: mutate one per-array file behind the doc's back and the
    cross-check names the drifted entry."""
    import json

    root = _fresh(f"cons_drift_v{version}")
    st = ZarrStore.create(root, version=version)
    comp = {"id": "zlib" if version == 2 else "gzip", "level": 1}
    st.create_array("a", shape=(8,), chunks=(8,), dtype="int8", dims=("i",),
                    compressor=comp)
    st.consolidate()
    assert specr.verify_consolidated(root) == []
    # drift 1: edit the per-array doc directly (doc now stale)
    leaf = os.path.join(root, "a", "zarr.json" if version == 3 else ".zarray")
    doc = json.load(open(leaf))
    (doc.setdefault("attributes", {}) if version == 3 else doc).update(
        {"fill_value": 7} if version == 2 else {"sneaky": True})
    json.dump(doc, open(leaf, "w"))
    diffs = specr.verify_consolidated(root)
    assert diffs and any("a" in d for d in diffs)
    # drift 2: an array present in the tree but absent from the doc
    st2 = ZarrStore.create(_fresh(f"cons_drift2_v{version}"),
                           version=version)
    st2.create_array("x", shape=(4,), chunks=(4,), dtype="int8", dims=("i",))
    st2.consolidate()
    st2root = st2.root
    # write a new array's metadata directly, bypassing reconsolidation
    extra = os.path.join(st2root, "ghost")
    os.makedirs(extra, exist_ok=True)
    src = os.path.join(st2root, "x", "zarr.json" if version == 3 else ".zarray")
    shutil.copy(src, os.path.join(
        extra, "zarr.json" if version == 3 else ".zarray"))
    diffs2 = specr.verify_consolidated(st2root)
    assert any("ghost" in d and "missing from" in d for d in diffs2), diffs2
